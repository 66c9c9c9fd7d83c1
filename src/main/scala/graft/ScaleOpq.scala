package graft

/**
 * OPQ probe (round-16 ask #6, stretch): does a LEARNED ROTATION recover
 * product quantization's low-dim recall loss? Public basis: Ge et al.
 * 2013, "Optimized Product Quantization" (the non-parametric OPQ-NP
 * alternation: fix R, train/assign per-subspace codebooks on the rotated
 * data; fix codes, solve the orthogonal Procrustes problem
 * min_R ||XR − C||_F via one SVD of X^T C per iteration).
 *
 * This is a QUANTIZER-LEVEL measurement, deliberately isolated from the
 * routed graphs: corpus and queries are unit-normalized (so euclidean
 * ADC ordering ≡ cosine ordering), the served emulation is exactly the
 * engine's two-phase PQ contract — ADC top-(K + PqSlack) shortlist,
 * exact rescore, top-K — against exact brute-force truth. If rotation
 * does not move THIS number, it cannot move the graph-served one (the
 * graph only adds probe/beam error on top); if it does, productizing R
 * behind the VecStore seam is a known quantity for a future round.
 *
 * Driver-side numerics on purpose: 50k × 64-d is MBs, and the question
 * is about quantizer geometry, not distribution — the distributed twin
 * (PqCodebook.train) stays the production path. Deterministic: no RNG
 * anywhere (inits are smallest-index rows, the SiftGen stream is seeded).
 *
 * Usage: runMain graft.ScaleOpq [nCorpus] [dim] (default 50000 64)
 */
object ScaleOpq {

  private val K = 50
  private val NQueries = 100
  private val Ksub = 256
  private val PqSlack = 128 // NodeStorage.Pq.rescoreSlack — the served over-fetch

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val m = math.max(1, dim / 8)
    val dsub = dim / m
    require(dim % m == 0)

    val gen = new ScaleRecall.SiftGen(seed = 4242L, dim = dim, intrinsic = 12)
    def unit(v: Array[Float]): Array[Float] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
      out
    }
    val xs = Array.tabulate(n)(i => unit(gen(i.toLong)))
    val qs = Array.tabulate(NQueries)(i => unit(gen(10000000L + i)))
    println(s"corpus $n x $dim (unit-normalized SIFT-shaped), m=$m ksub=$Ksub")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // exact ground truth: brute cosine (= dot on unit vectors) top-K
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    val truth: Array[Set[Int]] = timed("exact ground truth") {
      qs.map { q =>
        topIdx(Array.tabulate(n)(i => dot(q, xs(i))), K, largest = true).toSet
      }
    }

    // ---------------- plain PQ arm (the round-15 production geometry)
    val booksPq = timed("PQ train (10 Lloyd iters/subspace)") {
      trainBooks(xs, m, dsub, iters = 10)
    }
    val rPq = servedRecall(xs, qs, truth, booksPq, m, dsub, rot = null)
    println(f"PQ    served Recall@$K%d (ADC shortlist ${K + PqSlack}%d + exact rescore): ${rPq._2}%.4f (raw ADC ${rPq._1}%.4f)")

    // ---------------- OPQ-NP arm: alternate codebooks <-> rotation
    var rot = identity(dim)
    var booksOpq: Array[Array[Array[Float]]] = null
    timed("OPQ-NP train (10 alternations)") {
      var it = 0
      while (it < 10) {
        val xr = xs.map(apply(rot, _))
        booksOpq = trainBooks(xr, m, dsub, iters = if (it == 0) 10 else 2)
        // reconstructions C of the rotated data under the current books
        val recon = xr.map(x => decode(encode(x, booksOpq, m, dsub), booksOpq, m, dsub))
        // Procrustes: min_R ||X R - C||_F  =>  R = U V^T of svd(X^T C)
        val mtx = Array.ofDim[Double](dim, dim)
        var i = 0
        while (i < n) {
          val x = xs(i); val c = recon(i)
          var a = 0
          while (a < dim) {
            val xa = x(a).toDouble
            if (xa != 0.0) {
              var b = 0
              val row = mtx(a)
              while (b < dim) { row(b) += xa * c(b); b += 1 }
            }
            a += 1
          }
          i += 1
        }
        rot = procrustes(mtx, dim)
        it += 1
      }
    }
    val xrFinal = xs.map(apply(rot, _))
    val rOpq = servedRecallRotated(xs, xrFinal, qs, truth, booksOpq, m, dsub, rot)
    println(f"OPQ   served Recall@$K%d (same shortlist + rescore, learned rotation): ${rOpq._2}%.4f (raw ADC ${rOpq._1}%.4f)")
    println(f"delta: OPQ - PQ = ${rOpq._2 - rPq._2}%+.4f served, ${rOpq._1 - rPq._1}%+.4f raw")
  }

  // ------------------------------------------------------------ helpers

  private def identity(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

  /** y = R^T x (rotate a vector into the quantization basis; R is the
    * Procrustes solution of ||X R − C||, so codes live in the R-image). */
  private def apply(r: Array[Array[Double]], x: Array[Float]): Array[Float] = {
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

  /** Deterministic per-subspace Lloyd (the PqCodebook.train geometry,
    * driver-side): init = subvectors of the Ksub smallest-index rows,
    * empty cells keep their previous centroid. */
  private def trainBooks(xs: Array[Array[Float]], m: Int, dsub: Int,
      iters: Int): Array[Array[Array[Float]]] = {
    val n = xs.length
    var books = Array.tabulate(m)(s => Array.tabulate(Ksub) { j =>
      java.util.Arrays.copyOfRange(xs(j % n), s * dsub, (s + 1) * dsub)
    })
    var it = 0
    while (it < iters) {
      val sums = Array.fill(m, Ksub, dsub)(0.0)
      val cnts = Array.fill(m, Ksub)(0L)
      var i = 0
      while (i < n) {
        val x = xs(i)
        var s = 0
        while (s < m) {
          val c = nearestCell(x, s * dsub, books(s), dsub)
          cnts(s)(c) += 1
          var p = 0
          while (p < dsub) { sums(s)(c)(p) += x(s * dsub + p); p += 1 }
          s += 1
        }
        i += 1
      }
      books = Array.tabulate(m)(s => Array.tabulate(Ksub) { c =>
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

  private def encode(x: Array[Float], books: Array[Array[Array[Float]]],
      m: Int, dsub: Int): Array[Int] =
    Array.tabulate(m)(s => nearestCell(x, s * dsub, books(s), dsub))

  private def decode(code: Array[Int], books: Array[Array[Array[Float]]],
      m: Int, dsub: Int): Array[Float] = {
    val out = new Array[Float](m * dsub)
    var s = 0
    while (s < m) {
      System.arraycopy(books(s)(code(s)), 0, out, s * dsub, dsub)
      s += 1
    }
    out
  }

  /** (raw ADC recall, served recall through shortlist+exact-rescore). */
  private def servedRecall(xs: Array[Array[Float]], qs: Array[Array[Float]],
      truth: Array[Set[Int]], books: Array[Array[Array[Float]]],
      m: Int, dsub: Int, rot: Array[Array[Double]]): (Double, Double) =
    servedRecallRotated(xs,
      if (rot == null) xs else xs.map(apply(rot, _)),
      qs, truth, books, m, dsub, rot)

  private def servedRecallRotated(xs: Array[Array[Float]],
      xEnc: Array[Array[Float]], qs: Array[Array[Float]],
      truth: Array[Set[Int]], books: Array[Array[Array[Float]]],
      m: Int, dsub: Int, rot: Array[Array[Double]]): (Double, Double) = {
    val n = xs.length
    val codes = Array.tabulate(n)(i => encode(xEnc(i), books, m, dsub))
    var rawSum = 0.0; var servedSum = 0.0
    qs.indices.foreach { qi =>
      val q = qs(qi)
      val qr = if (rot == null) q else apply(rot, q)
      // ADC table: per (subspace, cell) squared distance to the query
      val tab = Array.tabulate(m, Ksub) { (s, c) =>
        var d = 0.0; var p = 0
        val cell = books(s)(c)
        while (p < dsub) {
          val diff = qr(s * dsub + p) - cell(p); d += diff.toDouble * diff; p += 1
        }
        d
      }
      val adc = Array.tabulate(n) { i =>
        var d = 0.0; var s = 0
        val code = codes(i)
        while (s < m) { d += tab(s)(code(s)); s += 1 }
        -d // larger = closer, to share topIdx
      }
      val short = topIdx(adc, K + PqSlack, largest = true)
      rawSum += (short.take(K).toSet & truth(qi)).size.toDouble / K
      val rescored = short.sortBy(i => (-dotD(q, xs(i)), i)).take(K)
      servedSum += (rescored.toSet & truth(qi)).size.toDouble / K
    }
    (rawSum / qs.length, servedSum / qs.length)
  }

  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  /** Indices of the `k` largest (or smallest) scores, deterministic ties
    * by index — a bounded selection, never a full sort of n. */
  private def topIdx(scores: Array[Double], k: Int, largest: Boolean): Array[Int] = {
    // bounded heap on (score, idx); head = worst kept entry
    val heapOrd = new Ordering[(Double, Int)] {
      def compare(a: (Double, Int), b: (Double, Int)): Int = {
        val c = java.lang.Double.compare(
          if (largest) -a._1 else a._1, if (largest) -b._1 else b._1)
        if (c != 0) c else Integer.compare(a._2, b._2)
      }
    }
    val h = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](heapOrd)
    var i = 0
    while (i < scores.length) {
      val e = (scores(i), i)
      if (h.size < k) h.enqueue(e)
      else if (heapOrd.lt(e, h.head)) { h.dequeue(); h.enqueue(e) }
      i += 1
    }
    h.toArray.sortBy { case (s, idx) => (if (largest) -s else s, idx) }.map(_._2)
  }

  /** Orthogonal Procrustes: the R = U V^T of svd(M) maximizing
    * tr(R^T M) — one-sided cyclic Jacobi SVD (public textbook numerics;
    * dims here are ≤ a few hundred, driver-side). */
  private def procrustes(mtx: Array[Array[Double]], d: Int): Array[Array[Double]] = {
    // one-sided Jacobi: orthogonalize the columns of A = M by plane
    // rotations accumulated into V; then U = normalized columns of A,
    // R = U V^T
    val a = Array.tabulate(d, d)((i, j) => mtx(i)(j))
    val v = identity(d)
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
    // U columns = normalized A columns (zero-norm columns fall back to a
    // canonical basis vector — degenerate only for rank-deficient data)
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
    // R = U V^T
    Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += u(i)(k) * v(j)(k); k += 1 }
      s
    }
  }
}
