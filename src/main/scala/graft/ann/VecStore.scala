package graft.ann

import scala.collection.mutable

import graft.functions.Similarity.jvm
import graft.types.Algorithm

/**
 * Lossless vector currency for graph (re)builds: a node's stored form,
 * carried EXACTLY through compaction rebuilds. A quantized shard that
 * extracted float vectors and re-encoded them on every compaction would
 * accumulate one quantization step of drift per rebuild; carrying the
 * codes themselves makes compaction drift-free by construction (the same
 * reason the routed manifest round-trips centroid floats as int bits).
 */
sealed trait VecPayload extends Serializable
object VecPayload {
  final case class F32(v: Array[Float]) extends VecPayload
  final case class Sq8(codes: Array[Byte], mn: Float, mx: Float) extends VecPayload
}

/**
 * Node-vector storage behind [[HnswIndex]] — the seam that lets a graph
 * hold full-precision float32 vectors (the reference layout,
 * `ahnlich/similarity/src/hnsw/index.rs` node payloads) OR per-vector
 * min/max int8 codes (SQ8 — the 100 TB memory lever: the reference
 * budgets ~60-450 B/element of GRAPH overhead, docs/specs/hnsw.md:117-127,
 * but at 768 dims the 3 KB float payload dwarfs it; codes + two floats
 * are ~1/4 the bytes). All distances are smaller-is-closer per metric
 * (cosine → −cos, dot → −dot, euclidean → squared euclidean), double
 * accumulation in ascending index order — the [[graft.functions
 * .Similarity.jvm]] operation order, so the float store is bit-identical
 * to the pre-seam implementation and the SQ8 store is bit-identical to
 * scoring [[graft.functions.Quantize.dequantize]]d vectors.
 */
private[ann] sealed trait VecStore extends Serializable {
  def size: Int
  /** Append a float vector (encodes under SQ8 — [[graft.functions
    * .Quantize.int8Codes]] math: `min(255, floor((x−mn)·255/(mx−mn)))`,
    * constant vectors to all-zero codes). */
  def add(v: Array[Float]): Unit
  /** Append a stored-form payload without re-encoding (the compaction
    * path). A store refuses a payload of the other storage kind — mixing
    * would silently change the scoring scale mid-graph. */
  def addPayload(p: VecPayload): Unit
  def payload(i: Int): VecPayload
  /** Node i as floats — EXACT for the float store, dequantized
    * (`mn + q·(mx−mn)/255`, cast to float) for SQ8. */
  def export(i: Int): Array[Float]
  /** Internal distance between two STORED nodes (the build path — a
    * quantized graph is built on the codes it will search). */
  def distNodes(i: Int, j: Int): Double
  /** Internal distance between a float query and stored node i (the
    * search path — asymmetric under SQ8: the query stays exact). */
  def distQuery(q: Array[Float], i: Int): Double
}

private[ann] final class FloatVecStore(metric: Algorithm) extends VecStore {
  private val vecs = mutable.ArrayBuffer[Array[Float]]()
  def size: Int = vecs.length
  def add(v: Array[Float]): Unit = vecs += v
  def addPayload(p: VecPayload): Unit = p match {
    case VecPayload.F32(v) => add(v)
    case other => throw new IllegalStateException(
      s"float vector store cannot absorb ${other.getClass.getSimpleName}")
  }
  def payload(i: Int): VecPayload = VecPayload.F32(vecs(i))
  def export(i: Int): Array[Float] = vecs(i)
  @inline private def dist(a: Array[Float], b: Array[Float]): Double =
    metric match {
      case Algorithm.EuclideanDistance => jvm.sqEuclidean(a, b)
      case Algorithm.DotProductSimilarity => -jvm.dot(a, b)
      case _ => -jvm.cosine(a, b)
    }
  def distNodes(i: Int, j: Int): Double = dist(vecs(i), vecs(j))
  def distQuery(q: Array[Float], i: Int): Double = dist(q, vecs(i))
}

/** Scalar (per-vector min/max) int8 node storage — 1 byte/dimension + two
  * floats instead of 4 bytes/dimension. Distances dequantize INLINE (no
  * intermediate arrays); the graph both builds and traverses on the
  * quantized values, so its recall is measured for exactly the
  * representation it serves — the [[IvfIndex.calibrate]] SQ8-arm
  * provenance rule. Exact ranking is restored downstream by the
  * shortlist rescore (engine hydration / [[RoutedAnnIndex
  * .topKJoinRescored]]), never claimed here. */
private[ann] final class Sq8VecStore(metric: Algorithm) extends VecStore {
  private val codes = mutable.ArrayBuffer[Array[Byte]]()
  private val mns = new FloatBuf()
  private val mxs = new FloatBuf()
  def size: Int = codes.length

  def add(v: Array[Float]): Unit = {
    var mn = Double.MaxValue; var mx = Double.MinValue
    var i = 0
    while (i < v.length) {
      val x = v(i).toDouble
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    if (v.length == 0) { mn = 0.0; mx = 0.0 }
    val c = new Array[Byte](v.length)
    if (mx != mn) {
      i = 0
      while (i < v.length) {
        // (x − mn) · 255 / (mx − mn) with the multiply-last order of
        // Quantize.int8Codes: (x − mn) * 255.0 / (mx − mn)
        val q = math.min(255.0, math.floor((v(i).toDouble - mn) * 255.0 / (mx - mn)))
        c(i) = q.toInt.toByte
        i += 1
      }
    }
    codes += c; mns += mn.toFloat; mxs += mx.toFloat
  }

  def addPayload(p: VecPayload): Unit = p match {
    case VecPayload.Sq8(c, mn, mx) => codes += c; mns += mn; mxs += mx
    case VecPayload.F32(v) => add(v)
  }
  def payload(i: Int): VecPayload = VecPayload.Sq8(codes(i), mns(i), mxs(i))

  def export(i: Int): Array[Float] = {
    val c = codes(i); val mn = mns(i).toDouble; val mx = mxs(i).toDouble
    val step = (mx - mn) / 255.0
    val out = new Array[Float](c.length)
    var j = 0
    while (j < c.length) {
      out(j) = (mn + (c(j) & 0xFF).toDouble * step).toFloat
      j += 1
    }
    out
  }

  // fused kernels: accumulate (dot, normA², normB²) / squared difference
  // over dequantized elements in one ascending pass — the jvm kernel
  // operation order over Quantize.dequantize values, zero allocations
  def distNodes(i: Int, j: Int): Double = {
    val ca = codes(i); val mna = mns(i).toDouble
    val stepA = (mxs(i).toDouble - mna) / 255.0
    val cb = codes(j); val mnb = mns(j).toDouble
    val stepB = (mxs(j).toDouble - mnb) / 255.0
    metric match {
      case Algorithm.EuclideanDistance =>
        var s = 0.0; var x = 0
        while (x < ca.length) {
          val t = (mna + (ca(x) & 0xFF).toDouble * stepA) -
            (mnb + (cb(x) & 0xFF).toDouble * stepB)
          s += t * t; x += 1
        }
        s
      case Algorithm.DotProductSimilarity =>
        var s = 0.0; var x = 0
        while (x < ca.length) {
          s += (mna + (ca(x) & 0xFF).toDouble * stepA) *
            (mnb + (cb(x) & 0xFF).toDouble * stepB)
          x += 1
        }
        -s
      case _ =>
        var dp = 0.0; var na = 0.0; var nb = 0.0; var x = 0
        while (x < ca.length) {
          val a = mna + (ca(x) & 0xFF).toDouble * stepA
          val b = mnb + (cb(x) & 0xFF).toDouble * stepB
          dp += a * b; na += a * a; nb += b * b; x += 1
        }
        if (na == 0.0 || nb == 0.0) 0.0
        else -(dp / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  def distQuery(q: Array[Float], i: Int): Double = {
    val c = codes(i); val mn = mns(i).toDouble
    val step = (mxs(i).toDouble - mn) / 255.0
    metric match {
      case Algorithm.EuclideanDistance =>
        var s = 0.0; var x = 0
        while (x < c.length) {
          val t = q(x).toDouble - (mn + (c(x) & 0xFF).toDouble * step)
          s += t * t; x += 1
        }
        s
      case Algorithm.DotProductSimilarity =>
        var s = 0.0; var x = 0
        while (x < c.length) {
          s += q(x).toDouble * (mn + (c(x) & 0xFF).toDouble * step)
          x += 1
        }
        -s
      case _ =>
        var dp = 0.0; var nq = 0.0; var nb = 0.0; var x = 0
        while (x < c.length) {
          val a = q(x).toDouble
          val b = mn + (c(x) & 0xFF).toDouble * step
          dp += a * b; nq += a * a; nb += b * b; x += 1
        }
        if (nq == 0.0 || nb == 0.0) 0.0
        else -(dp / (math.sqrt(nq) * math.sqrt(nb)))
    }
  }
}
