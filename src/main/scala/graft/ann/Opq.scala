package graft.ann

/**
 * Optimized Product Quantization (Ge et al. 2013): a learned ORTHOGONAL
 * rotation applied before PQ encoding, recovering most of plain PQ's
 * low-dimension recall loss (the round-16 `graft.ScaleOpq` measurement:
 * 64-d served Recall@50 0.951 → 0.996 through the same shortlist +
 * rescore; raw ADC +11.7pt). [[OpqRotation]] is the trained rotation —
 * carried beside the [[PqCodebook]] on [[NodeStorage.Opq]], with the
 * same compact-wire + content-verified executor interning discipline
 * (a rotation is d² floats: 16 KB at 64-d, 2.3 MB at 768-d — exactly
 * the per-shard multiplication the codebook's interning exists to
 * prevent).
 *
 * Convention: the quantization basis is x' = Rᵀx ([[OpqRotation
 * .rotate]]); codes and codebooks live in that basis. R orthogonal
 * preserves dot, euclidean, and norms, so metric scores computed in the
 * rotated basis equal the original-space scores — the wrapped
 * [[PqVecStore]] needs no metric changes at all. [[OpqRotation
 * .rotateBack]] (x ≈ R x̂') is the export path: everything downstream of
 * a shard (compaction extraction, calibration ground truth, the exact
 * rescore) sees original-space floats.
 */
@SerialVersionUID(1L)
final class OpqRotation(
    val dim: Int,
    /** Row-major R: flat(i*dim + j) = R(i)(j). */
    val flat: Array[Float]) extends Serializable {
  require(flat.length == dim * dim,
    s"rotation of ${flat.length} entries is not $dim x $dim")

  /** x' = Rᵀx — into the quantization basis (encode/query side). */
  def rotate(v: Array[Float]): Array[Float] = {
    require(v.length == dim, s"vector of dim ${v.length} against a $dim-d rotation")
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i).toDouble * flat(i * dim + j); i += 1 }
      out(j) = s.toFloat
      j += 1
    }
    out
  }

  /** x = R x' — back to the original space (export side). */
  def rotateBack(v: Array[Float]): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var s = 0.0; var j = 0
      val base = i * dim
      while (j < dim) { s += flat(base + j).toDouble * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** Compact wire form + executor interning — the [[PqCodebook
    * .writeReplace]] discipline: every shard .bin deserializes
    * standalone, so without interning a JVM holding many shards would
    * hold one d²-float matrix PER SHARD. */
  private def writeReplace(): AnyRef = new OpqRotation.SerialForm(dim, flat)
}

object OpqRotation {

  private final class SerialForm(dim: Int, flat: Array[Float])
      extends Serializable {
    private def readResolve(): AnyRef = canonical(dim, flat)
  }

  // bounded access-ordered LRU with content verification — one shared
  // instance per JVM per distinct rotation (the PqCodebook.canonical
  // pattern, including its round-16 eviction/collision observability)
  private val MaxInterned = 64
  private val interned =
    new java.util.LinkedHashMap[(Int, Int), OpqRotation](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, Int), OpqRotation]): Boolean = {
        val evict = size > MaxInterned
        if (evict) org.slf4j.LoggerFactory.getLogger(OpqRotation.getClass).info(
          s"OpqRotation intern cache over $MaxInterned rotations — evicting " +
            "the least-recently-used entry")
        evict
      }
    }

  private[ann] def canonical(dim: Int, flat: Array[Float]): OpqRotation = {
    val key = (dim, java.util.Arrays.hashCode(flat))
    val hit = interned.synchronized(interned.get(key))
    if (hit != null) {
      if (java.util.Arrays.equals(hit.flat, flat)) hit
      else {
        org.slf4j.LoggerFactory.getLogger(OpqRotation.getClass).warn(
          s"OpqRotation.canonical: 32-bit content-hash collision at dim=$dim " +
            "— serving a NON-interned fresh rotation; executor-level dedup " +
            "is lost for it")
        new OpqRotation(dim, flat)
      }
    } else {
      val fresh = new OpqRotation(dim, flat)
      interned.synchronized {
        val winner = interned.get(key)
        if (winner != null && java.util.Arrays.equals(winner.flat, flat)) winner
        else { interned.put(key, fresh); fresh }
      }
    }
  }

  /** Rotation artifact beside the routed manifest — the [[PqCodebook
    * .save]] discipline: stamp-matched, float bits exact, stale loads
    * retrain whole. */
  def save(rot: OpqRotation, dir: String, sourceStamp: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val json = JObject(
      "kind" -> JString("opq-rotation"),
      "dim" -> JInt(rot.dim),
      "sourceStamp" -> JString(sourceStamp),
      "flat" -> JArray(rot.flat.toList.map(f =>
        JInt(BigInt(java.lang.Float.floatToRawIntBits(f))))))
    val target = java.nio.file.Paths.get(dir, "opq_manifest.json")
    val tmp = target.resolveSibling("opq_manifest.json.tmp")
    java.nio.file.Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(json)))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def load(dir: String, sourceStamp: String): Option[OpqRotation] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir, "opq_manifest.json")
      if (!java.nio.file.Files.exists(p)) return None
      val j = JsonMethods.parse(java.nio.file.Files.readString(p))
      if ((j \ "kind") != JString("opq-rotation")) return None
      if ((j \ "sourceStamp") != JString(sourceStamp)) return None
      val dim = (j \ "dim") match { case JInt(d) => d.toInt; case _ => return None }
      val flat = (j \ "flat") match {
        case JArray(vs) => vs.map {
          case JInt(b) => java.lang.Float.intBitsToFloat(b.toInt)
          case _ => return None
        }.toArray
        case _ => return None
      }
      if (flat.length != dim * dim) return None
      Some(canonical(dim, flat))
    } catch { case scala.util.control.NonFatal(_) => None }
}

/**
 * OPQ-NP training (Ge et al. 2013 §4, the non-parametric alternation):
 * fix R, train/assign per-subspace codebooks on the rotated sample; fix
 * the codes' reconstructions C, solve the orthogonal Procrustes problem
 * min_R ||XR − C||_F (one SVD of XᵀC — one-sided cyclic Jacobi, public
 * textbook numerics; d ≤ a few hundred, driver-side). Deterministic end
 * to end: no RNG (codebook init = subvectors of the first sample rows,
 * the PqCodebook.train convention; Jacobi is deterministic), so a
 * recluster retrains to the same rotation given the same sample.
 *
 * DRIVER-SIDE on a bounded sample by design: rotation + ksub ≤ 256
 * codebooks saturate at tens of thousands of training rows (the Faiss
 * OPQ convention), so the train cost is O(sample · d² · alternations) —
 * independent of corpus size — and the full corpus is only ever ENCODED
 * (JVM-side per shard, inside the same mapPartitions build every other
 * storage uses). The distributed Lloyd ([[PqCodebook.train]]) remains
 * the plain-PQ path.
 *
 * Cost envelope (measured, ScaleQuant opq arm, the parallel trainer):
 * ~4 s at 64-d / ~10 s at 128-d for the full alternation — build wall
 * at plain-pq parity (8.7 vs 7.4 s at 50k×64). The d² terms still grow
 * steeply with dimension; at serving dims (768) prefer plain pq — it is
 * already within −0.7pt of f32 there (the 500k rehearsal) and needs no
 * rotation.
 */
private[graft] object OpqTrain {

  /** Bounded training-sample rows (deterministic id-hash bottom-n draw —
    * [[Calibration.selfSample]]): the Faiss-convention saturation point
    * for a d² rotation + ksub ≤ 256 codebooks. */
  val TrainSample = 65536

  /** FIXED parallel-chunk count for the trainer's hot loops. Fixed — not
    * `availableProcessors` — because chunk boundaries and the sequential
    * chunk-order merge of floating-point partials are part of the
    * DETERMINISTIC-train contract (OpqRoutedSpec's bit-identical retrain
    * pin): the same sample trains the same rotation on any machine. */
  val TrainChunks = 64

  /** Run `f(start, end)` over fixed row chunks in parallel, returning
    * partials in CHUNK ORDER (the caller merges sequentially — the
    * determinism rule above). */
  private def parChunks[T](n: Int)(f: (Int, Int) => T): IndexedSeq[T] = {
    val bounds = (0 to TrainChunks).map(c => ((n.toLong * c) / TrainChunks).toInt)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futs = (0 until TrainChunks).map(c => Future(f(bounds(c), bounds(c + 1))))
    futs.map(Await.result(_, Duration.Inf))
  }

  /** (rotation, codebook) from an OPQ-NP alternation over `sample`. */
  def train(sample: Array[Array[Float]], dim: Int, m: Int, ksub: Int,
      alternations: Int = 10): (OpqRotation, PqCodebook) = {
    require(sample.nonEmpty, "OPQ training sample is empty")
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val n = sample.length
    var rot: Array[Array[Double]] =
      Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var books: Array[Array[Array[Float]]] = null
    def rotated(): Array[Array[Float]] = {
      val xr = new Array[Array[Float]](n)
      parChunks(n) { (a, b) =>
        var i = a
        while (i < b) { xr(i) = applyRot(rot, sample(i)); i += 1 }
      }
      xr
    }
    var it = 0
    while (it < alternations) {
      val xr = rotated()
      books = trainBooks(xr, m, dsub, ksub, iters = if (it == 0) 10 else 2)
      // reconstructions of the rotated data under the current books —
      // X^T C accumulated as per-chunk partial matrices, merged in chunk
      // order (deterministic; see TrainChunks)
      val bks = books
      val partials = parChunks(n) { (lo, hi) =>
        val part = Array.ofDim[Double](dim, dim)
        var i = lo
        while (i < hi) {
          val x = sample(i)
          val c = decode(encode(xr(i), bks, m, dsub, ksub), bks, m, dsub)
          var a = 0
          while (a < dim) {
            val xa = x(a).toDouble
            if (xa != 0.0) {
              val row = part(a)
              var b = 0
              while (b < dim) { row(b) += xa * c(b); b += 1 }
            }
            a += 1
          }
          i += 1
        }
        part
      }
      val mtx = Array.ofDim[Double](dim, dim)
      partials.foreach { part =>
        var a = 0
        while (a < dim) {
          val row = mtx(a); val src = part(a)
          var b = 0
          while (b < dim) { row(b) += src(b); b += 1 }
          a += 1
        }
      }
      rot = procrustes(mtx, dim)
      it += 1
    }
    // FINAL books must match the FINAL rotation: one more codebook pass
    // on the final basis (the alternation ends on a rotation update)
    books = trainBooks(rotated(), m, dsub, ksub, iters = 2)
    val flat = new Array[Float](dim * dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) { flat(i * dim + j) = rot(i)(j).toFloat; j += 1 }
      i += 1
    }
    (OpqRotation.canonical(dim, flat), new PqCodebook(dim, m, ksub, books))
  }

  private def applyRot(r: Array[Array[Double]], x: Array[Float]): Array[Float] = {
    val d = x.length
    val out = new Array[Float](d)
    var j = 0
    while (j < d) {
      var s = 0.0; var i = 0
      while (i < d) { s += x(i) * r(i)(j); i += 1 }
      out(j) = s.toFloat
      j += 1
    }
    out
  }

  /** Deterministic per-subspace Lloyd (the [[PqCodebook.train]] geometry,
    * driver-side): init = subvectors of the first `ksub` sample rows
    * (callers pass the sample in a deterministic order — id-ascending
    * from [[NodeStorage.train]]), empty cells keep their previous
    * centroid. */
  private[graft] def trainBooks(xs: Array[Array[Float]], m: Int, dsub: Int,
      ksub: Int, iters: Int): Array[Array[Array[Float]]] = {
    val n = xs.length
    var books = Array.tabulate(m)(s => Array.tabulate(ksub) { j =>
      java.util.Arrays.copyOfRange(xs(j % n), s * dsub, (s + 1) * dsub)
    })
    var it = 0
    while (it < iters) {
      // per-chunk (sums, counts) partials merged in chunk order — the
      // same deterministic parallel shape as the Procrustes accumulation
      val bks = books
      val partials = parChunks(n) { (lo, hi) =>
        val sums = Array.fill(m, ksub, dsub)(0.0)
        val cnts = Array.fill(m, ksub)(0L)
        var i = lo
        while (i < hi) {
          val x = xs(i)
          var s = 0
          while (s < m) {
            val c = nearestCell(x, s * dsub, bks(s), dsub)
            cnts(s)(c) += 1
            var p = 0
            while (p < dsub) { sums(s)(c)(p) += x(s * dsub + p); p += 1 }
            s += 1
          }
          i += 1
        }
        (sums, cnts)
      }
      val sums = Array.fill(m, ksub, dsub)(0.0)
      val cnts = Array.fill(m, ksub)(0L)
      partials.foreach { case (ps, pc) =>
        var s = 0
        while (s < m) {
          var c = 0
          while (c < ksub) {
            cnts(s)(c) += pc(s)(c)
            var p = 0
            while (p < dsub) { sums(s)(c)(p) += ps(s)(c)(p); p += 1 }
            c += 1
          }
          s += 1
        }
      }
      books = Array.tabulate(m)(s => Array.tabulate(ksub) { c =>
        if (cnts(s)(c) == 0) books(s)(c)
        else Array.tabulate(dsub)(p => (sums(s)(c)(p) / cnts(s)(c)).toFloat)
      })
      it += 1
    }
    books
  }

  private def nearestCell(x: Array[Float], off: Int,
      book: Array[Array[Float]], dsub: Int): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < book.length) {
      var d = 0.0; var p = 0
      val cell = book(c)
      while (p < dsub) {
        val diff = x(off + p) - cell(p); d += diff.toDouble * diff; p += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private[graft] def encode(x: Array[Float], books: Array[Array[Array[Float]]],
      m: Int, dsub: Int, ksub: Int): Array[Int] =
    Array.tabulate(m)(s => nearestCell(x, s * dsub, books(s), dsub))

  private[graft] def decode(code: Array[Int], books: Array[Array[Array[Float]]],
      m: Int, dsub: Int): Array[Float] = {
    val out = new Array[Float](m * dsub)
    var s = 0
    while (s < m) {
      System.arraycopy(books(s)(code(s)), 0, out, s * dsub, dsub)
      s += 1
    }
    out
  }

  /** Orthogonal Procrustes: R = U Vᵀ of svd(M), via one-sided cyclic
    * Jacobi (orthogonalize M's columns by plane rotations accumulated
    * into V; U = normalized columns). */
  private[graft] def procrustes(mtx: Array[Array[Double]], d: Int): Array[Array[Double]] = {
    val a = Array.tabulate(d, d)((i, j) => mtx(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var rotated = true
    while (sweep < 30 && rotated) {
      rotated = false
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < d) {
            app += a(i)(p) * a(i)(p); aqq += a(i)(q) * a(i)(q)
            apq += a(i)(p) * a(i)(q); i += 1
          }
          if (math.abs(apq) > 1e-12 * math.sqrt(app * aqq + 1e-300)) {
            rotated = true
            val tau = (aqq - app) / (2.0 * apq)
            val t = math.signum(tau) / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            i = 0
            while (i < d) {
              val ap = a(i)(p); val aq = a(i)(q)
              a(i)(p) = c * ap - s * aq; a(i)(q) = s * ap + c * aq
              val vp = v(i)(p); val vq = v(i)(q)
              v(i)(p) = c * vp - s * vq; v(i)(q) = s * vp + c * vq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val u = Array.ofDim[Double](d, d)
    var j = 0
    while (j < d) {
      var nrm = 0.0; var i = 0
      while (i < d) { nrm += a(i)(j) * a(i)(j); i += 1 }
      nrm = math.sqrt(nrm)
      i = 0
      while (i < d) {
        u(i)(j) = if (nrm > 1e-12) a(i)(j) / nrm else (if (i == j) 1.0 else 0.0)
        i += 1
      }
      j += 1
    }
    val r = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += u(i)(k) * v(j)(k); k += 1 }
      s
    }
    // the Procrustes optimum is exactly orthogonal; U V^T from a
    // bounded-sweep Jacobi (or a degenerate-column fallback) can sit a
    // few 1e-3 off it — enough to make rotate/rotateBack visibly lossy.
    // Re-orthonormalize the COLUMNS by modified Gram-Schmidt (a minimal
    // perturbation of a near-orthogonal matrix), so OpqRotation's
    // R Rᵀ = I invariant — which everything OpqVecStore assumes — holds
    // by construction, to machine precision.
    var c = 0
    while (c < d) {
      var p = 0
      while (p < c) {
        var dot = 0.0; var i = 0
        while (i < d) { dot += r(i)(c) * r(i)(p); i += 1 }
        i = 0
        while (i < d) { r(i)(c) -= dot * r(i)(p); i += 1 }
        p += 1
      }
      var nrm = 0.0; var i = 0
      while (i < d) { nrm += r(i)(c) * r(i)(c); i += 1 }
      nrm = math.sqrt(nrm)
      i = 0
      while (i < d) {
        r(i)(c) = if (nrm > 1e-12) r(i)(c) / nrm else (if (i == c) 1.0 else 0.0)
        i += 1
      }
      c += 1
    }
    r
  }
}
