package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.{Algorithm, NonLinearConfig}

/**
 * OPQ node storage ([[OpqVecStore]] / `RoutedAnnIndex(storage =
 * StorageSpec.Opq(m, ksub))`): PQ behind a LEARNED orthogonal rotation
 * (Ge et al. 2013) — same m bytes per node, the measured low-dim escape
 * hatch (`graft.ScaleOpq`: 64-d served Recall@50 0.951 → 0.996). These
 * tests pin
 *  - spec parse/resolve and key round trips (manifest identity),
 *  - the trained rotation's ORTHOGONALITY (RᵀR ≈ I — everything the
 *    wrapped [[PqVecStore]] assumes rests on it) and its
 *    rotate/rotateBack inversion,
 *  - [[OpqVecStore]] mechanics: encode-in-rotated-basis, export back to
 *    the original space, ADC scorer bit-identity, payload guards (an
 *    F32 payload rotates-then-encodes; foreign code payloads refuse),
 *  - executor interning of the rotation (one instance per JVM across
 *    deserializations — the codebook discipline),
 *  - deterministic training (same frame → bit-identical rotation),
 *  - the routed serving path (graph on rotated codes + exact rescore)
 *    reaching exact-grade recall at exhaustive probes,
 *  - artifact identity: rotation + codebook stamp-matched on load, no
 *    cross-storage loads, byte-identical answers after a round trip,
 *  - maintenance riding the shared LSM tiers (append overlay + search
 *    equality over the union).
 */
class OpqRoutedSpec extends AnyFunSuite {

  private val N = 4000
  private val Dim = 64
  private val K = 10
  private val Shards = 16
  private val M = 8
  private val Ksub = 64

  private lazy val (ids, vecs, gen) = siftLikeDataset(seed = 881L, n = N + 500, dim = Dim)

  private val cfg = NonLinearConfig.HNSWConfig(efConstruction = 100,
    maximumConnections = 40, maximumConnectionsZero = 80,
    efSearch = 64, metric = Algorithm.CosineSimilarity)

  private def df(range: Range) = {
    val s = spark
    import s.implicits._
    range.map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
  }

  private lazy val opq: RoutedAnnIndex =
    RoutedAnnIndex.build(df(0 until N), Dim, cfg, numShards = Shards,
      iters = 2, storage = StorageSpec.Opq(M, Ksub))

  private lazy val storageHandle: NodeStorage.Opq = opq.storage match {
    case o: NodeStorage.Opq => o
    case other => fail(s"expected OPQ storage, got $other")
  }

  test("StorageSpec: opq parses, resolves its split from the dimension, keys round-trip, bad splits refuse") {
    assert(StorageSpec.resolve("opq", 64) == StorageSpec.Opq(8, 256))
    assert(StorageSpec.resolve("opq", 768) == StorageSpec.Opq(96, 256))
    assert(StorageSpec.resolve("opq(m=4,ksub=16)", 64) == StorageSpec.Opq(4, 16))
    val key = StorageSpec.Opq(8, 256).key
    assert(StorageSpec.resolve(key, 64) == StorageSpec.Opq(8, 256))
    // opq and pq are DISTINCT identities (an opq artifact must never
    // load into a pq config — the rotation is load-bearing)
    assert(StorageSpec.Opq(8, 256).key != StorageSpec.Pq(8, 256).key)
    intercept[IllegalArgumentException] { StorageSpec.resolve("opq(m=7,ksub=16)", 64) }
    val e = intercept[IllegalArgumentException] {
      StorageSpec.resolve("opq(m=8,ksub=300)", 64)
    }
    assert(e.getMessage.contains("256"), e.getMessage)
  }

  test("trained rotation is orthogonal and rotateBack inverts rotate") {
    val rot = storageHandle.rot
    assert(rot.dim == Dim)
    // RᵀR ≈ I, column-pair dot products via rotate of basis vectors:
    // rotate(e_i) is R's i-th ROW, so pairwise row dots pin R Rᵀ = I —
    // with RᵀR = I equivalent for square R
    val rows = Array.tabulate(Dim) { i =>
      val e = new Array[Float](Dim); e(i) = 1f; rot.rotate(e)
    }
    for (i <- 0 until Dim; j <- i until Dim) {
      var s = 0.0; var p = 0
      while (p < Dim) { s += rows(i)(p).toDouble * rows(j)(p); p += 1 }
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(s - want) < 1e-4, s"R R^T[$i][$j] = $s")
    }
    // inversion on real vectors (float round trip tolerance)
    (0 until 8).foreach { i =>
      val back = rot.rotateBack(rot.rotate(vecs(i)))
      vecs(i).zip(back).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-4, s"rotateBack(rotate(v)) drifted: $a vs $b")
      }
    }
  }

  test("OpqVecStore pins: rotated-basis encode, original-space export, scorer bit-identity, payload guards") {
    val o = storageHandle
    val st = new OpqVecStore(Algorithm.CosineSimilarity, o.book, o.rot)
    (0 until 32).foreach(i => st.add(vecs(i)))
    val inner = new PqVecStore(Algorithm.CosineSimilarity, o.book)
    (0 until 32).foreach(i => inner.add(o.rot.rotate(vecs(i))))
    (0 until 32).foreach { i =>
      // codes are the rotated-basis encode (payload equality)
      (st.payload(i), inner.payload(i)) match {
        case (VecPayload.PqCode(a), VecPayload.PqCode(b)) =>
          assert(java.util.Arrays.equals(a, b), s"code mismatch at $i")
        case other => fail(s"unexpected payloads $other")
      }
      // export returns ORIGINAL-space floats: rotateBack of the decode
      val viaInner = o.rot.rotateBack(inner.export(i))
      assert(java.util.Arrays.equals(st.export(i), viaInner))
    }
    // scorer bit-identity to distQuery; scores equal the inner store's
    // scores of the rotated query (orthogonal invariance, exactly)
    val q = gen(99999L)
    val scorer = st.queryScorer(q)
    (0 until 32).foreach { i =>
      assert(scorer(i) == st.distQuery(q, i), s"scorer != distQuery at $i")
      assert(st.distQuery(q, i) == inner.distQuery(o.rot.rotate(q), i))
    }
    // an F32 payload is an overlay-tail fold: rotate-then-encode == add
    val st2 = new OpqVecStore(Algorithm.CosineSimilarity, o.book, o.rot)
    st2.addPayload(VecPayload.F32(vecs(40)))
    st2.add(vecs(40))
    (st2.payload(0), st2.payload(1)) match {
      case (VecPayload.PqCode(a), VecPayload.PqCode(b)) =>
        assert(java.util.Arrays.equals(a, b))
      case other => fail(s"unexpected payloads $other")
    }
    // foreign payload kinds refuse — mixed scoring scales never merge
    intercept[IllegalStateException] {
      st2.addPayload(VecPayload.Sq8(new Array[Byte](Dim), 0f, 1f))
    }
  }

  test("rotation interns: deserializations of one rotation share a single JVM instance") {
    val rot = storageHandle.rot
    def roundTrip(r: OpqRotation): OpqRotation = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(r); oos.close()
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      ois.readObject().asInstanceOf[OpqRotation]
    }
    val a = roundTrip(rot)
    val b = roundTrip(rot)
    assert(a eq b, "two deserializations must intern to one instance")
    assert(java.util.Arrays.equals(a.flat, rot.flat))
  }

  test("OPQ training is deterministic: the same frame trains a bit-identical rotation and codebook") {
    val a = NodeStorage.train(StorageSpec.Opq(M, Ksub), df(0 until 1500))
    val b = NodeStorage.train(StorageSpec.Opq(M, Ksub), df(0 until 1500))
    (a, b) match {
      case (NodeStorage.Opq(ba, ra), NodeStorage.Opq(bb, rb)) =>
        assert(java.util.Arrays.equals(ra.flat, rb.flat),
          "rotation must be deterministic")
        assert(java.util.Arrays.equals(ba.flatBook, bb.flatBook),
          "codebook must be deterministic")
      case other => fail(s"unexpected storages $other")
    }
  }

  test("routed OPQ serving path (graph on rotated codes + exact rescore) reaches exact-grade recall at exhaustive probes") {
    val s = spark
    import s.implicits._
    val queries = Array.tabulate(30)(i => gen((1000000 + i).toLong))
    val qdf = queries.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("qid", "qv")
      .select(org.apache.spark.sql.functions.col("qid"),
        org.apache.spark.sql.functions.col("qv").cast("array<float>").as("qv"))
    val served = opq.topKJoinRescored(qdf, "qid", "qv", K, Shards, df(0 until N))
      .select("qid", "cid", "rank").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
    var hit = 0; var tot = 0
    queries.zipWithIndex.foreach { case (q, i) =>
      val truth = bruteTopK(Algorithm.CosineSimilarity,
        ids.take(N), vecs.take(N), q, K).map(_._1)
      hit += served(i.toLong).count(truth.toSet); tot += K
    }
    val recall = hit.toDouble / tot
    assert(recall >= 0.95,
      f"exhaustive rescored OPQ recall $recall%.4f < 0.95")
  }

  test("artifact identity: rotation + codebook stamp-matched; no cross-storage loads; byte-identical answers after a round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-opq-artifacts").toString
    RoutedAnnIndex.save(opq, dir, sourceStamp = "opq-rt")
    // matched load restores storage (rotation interned == the live one)
    val loaded = RoutedAnnIndex.load(spark, dir, cfg, "opq-rt",
      iters = 2, storage = StorageSpec.Opq(M, Ksub))
    assert(loaded.isDefined, "matched OPQ artifact must load")
    loaded.get.storage match {
      case o: NodeStorage.Opq =>
        assert(java.util.Arrays.equals(o.rot.flat, storageHandle.rot.flat))
        assert(java.util.Arrays.equals(o.book.flatBook, storageHandle.book.flatBook))
      case other => fail(s"loaded storage $other")
    }
    val q = gen(777777L)
    assert(loaded.get.search(q, K, Shards) == opq.search(q, K, Shards),
      "round-tripped OPQ index must answer byte-identically")
    loaded.foreach(_.unpersist())
    // storage is identity: a pq or f32 config never loads opq artifacts
    assert(RoutedAnnIndex.load(spark, dir, cfg, "opq-rt",
      iters = 2, storage = StorageSpec.Pq(M, Ksub)).isEmpty)
    assert(RoutedAnnIndex.load(spark, dir, cfg, "opq-rt",
      iters = 2).isEmpty)
    // a stale stamp refuses (rotation + book retrain whole)
    assert(RoutedAnnIndex.load(spark, dir, cfg, "other-stamp",
      iters = 2, storage = StorageSpec.Opq(M, Ksub)).isEmpty)
  }

  test("maintenance rides the shared tiers: an append overlays and the union serves exactly at exhaustive probes") {
    val out = opq.appendOutcome(df(N until N + 200)).getOrElse(
      fail("in-distribution append tripped the drift guard"))
    assert(out.tier == "append")
    val union = out.index
    val q = gen(31337L)
    val got = union.search(q, K, Shards).map(_._1)
    // the graph arm ranks on quantized scores — verify through the same
    // rescore serving uses (top K + slack candidates, exact rescore)
    val cand = union.search(q, K + union.storage.rescoreSlack, Shards)
    val rescored = cand.map { case (id, _) =>
      val i = ids.indexOf(id)
      (id, graft.functions.Similarity.jvm.cosine(q, vecs(i)))
    }.sortBy { case (id, c) => (-c, id) }.take(K).map(_._1)
    val truth = bruteTopK(Algorithm.CosineSimilarity,
      ids.take(N + 200), vecs.take(N + 200), q, K).map(_._1)
    assert(rescored.count(truth.toSet) >= K - 1,
      s"post-append rescored top-$K diverged: $rescored vs $truth")
    assert(got.nonEmpty)
  }
}
