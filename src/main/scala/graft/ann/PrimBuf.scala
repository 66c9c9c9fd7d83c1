package graft.ann

/**
 * Growable primitive buffers for the graph structures ([[HnswIndex]]):
 * `scala.collection.mutable.ArrayBuffer[Int]` is generic, so every
 * neighbor entry boxes to a heap object (~16-24 B resident, and java
 * serialization writes the box) — measured on the 200k × 64-shard
 * routed index, the serialized GRAPH term was ~290 B/row against a
 * 256 B/row float payload, i.e. the neighbor lists cost as much as the
 * vectors they connect. These buffers back the same operations with flat
 * `Array[Int]`/`Array[Long]` (4/8 B per entry, compact in RAM and in the
 * shard artifacts alike). Doubling growth, no shrink — graph degree is
 * bounded by M/M0, so slack is bounded too.
 */
@SerialVersionUID(1L)
private[ann] final class IntBuf(initialCapacity: Int = 8) extends Serializable {
  private var arr = new Array[Int](math.max(1, initialCapacity))
  private var n = 0
  def length: Int = n
  def apply(i: Int): Int = arr(i)
  def +=(v: Int): this.type = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
    arr(n) = v; n += 1; this
  }
  def copy(): IntBuf = {
    val b = new IntBuf(math.max(1, n))
    System.arraycopy(arr, 0, b.arr, 0, n)
    b.n = n
    b
  }
  /** Serialize the FILLED prefix only (growth slack never hits disk). */
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeInt(arr(i)); i += 1 }
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    n = in.readInt()
    arr = new Array[Int](math.max(1, n))
    var i = 0
    while (i < n) { arr(i) = in.readInt(); i += 1 }
  }
}

@SerialVersionUID(1L)
private[ann] final class FloatBuf(initialCapacity: Int = 16) extends Serializable {
  private var arr = new Array[Float](math.max(1, initialCapacity))
  private var n = 0
  def length: Int = n
  def apply(i: Int): Float = arr(i)
  def +=(v: Float): this.type = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
    arr(n) = v; n += 1; this
  }
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeFloat(arr(i)); i += 1 }
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    n = in.readInt()
    arr = new Array[Float](math.max(1, n))
    var i = 0
    while (i < n) { arr(i) = in.readFloat(); i += 1 }
  }
}

/** Open-addressed long→int map (linear probing, power-of-two capacity,
  * ≤ 50% load): the per-node id→index lookup. The boxed
  * `mutable.HashMap[Long, Int]` costs ~80 B resident per entry (node +
  * boxed key + boxed value); this is 13 B/entry at the load ceiling.
  * Values must be ≥ 0 (node indexes) — `get` returns −1 for absent. */
@SerialVersionUID(1L)
private[ann] final class LongIntMap(initialCapacity: Int = 16) extends Serializable {
  private var cap = Integer.highestOneBit(
    math.max(16, initialCapacity) * 2 - 1) << 1
  private var keys = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var vals = new Array[Int](cap)
  private var n = 0
  def size: Int = n
  @inline private def slot(k: Long): Int = {
    var h = (k ^ (k >>> 33)) * 0xff51afd7ed558ccdL
    h ^= h >>> 33
    (h & (cap - 1)).toInt
  }
  def get(k: Long): Int = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & (cap - 1)
    }
    -1
  }
  def contains(k: Long): Boolean = get(k) >= 0
  def put(k: Long, v: Int): Unit = {
    require(v >= 0, "LongIntMap values must be non-negative")
    if ((n + 1) * 2 > cap) grow()
    insert(k, v)
  }
  private def insert(k: Long, v: Int): Unit = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & (cap - 1)
    }
    keys(i) = k; vals(i) = v; used(i) = true; n += 1
  }
  private def grow(): Unit = {
    val (ok, ou, ov, oc) = (keys, used, vals, cap)
    cap = oc << 1
    keys = new Array[Long](cap); used = new Array[Boolean](cap)
    vals = new Array[Int](cap); n = 0
    var i = 0
    while (i < oc) {
      if (ou(i)) insert(ok(i), ov(i))
      i += 1
    }
  }
  /** Serialize live entries only (rebuilt into fresh tables on read). */
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(n)
    var i = 0
    while (i < cap) {
      if (used(i)) { out.writeLong(keys(i)); out.writeInt(vals(i)) }
      i += 1
    }
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val m = in.readInt()
    cap = Integer.highestOneBit(math.max(16, m) * 2 - 1) << 1
    keys = new Array[Long](cap); used = new Array[Boolean](cap)
    vals = new Array[Int](cap); n = 0
    var i = 0
    while (i < m) { insert(in.readLong(), in.readInt()); i += 1 }
  }
}

@SerialVersionUID(1L)
private[ann] final class LongBuf(initialCapacity: Int = 16) extends Serializable {
  private var arr = new Array[Long](math.max(1, initialCapacity))
  private var n = 0
  def length: Int = n
  def apply(i: Int): Long = arr(i)
  def +=(v: Long): this.type = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
    arr(n) = v; n += 1; this
  }
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeLong(arr(i)); i += 1 }
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    n = in.readInt()
    arr = new Array[Long](math.max(1, n))
    var i = 0
    while (i < n) { arr(i) = in.readLong(); i += 1 }
  }
}
