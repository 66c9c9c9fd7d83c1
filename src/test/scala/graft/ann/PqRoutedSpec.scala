package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.{Algorithm, NonLinearConfig}

/**
 * PQ node storage inside the routed shard graphs ([[PqVecStore]] /
 * `RoutedAnnIndex(storage = StorageSpec.Pq(m, ksub))`): the graphs build
 * and traverse on product-quantized codes — m BYTES per vector, the
 * byte-budget end of the [[VecStore]] seam — and exact final ranking is
 * restored by the shortlist rescore at the WIDER PQ slack. These tests
 * pin
 *  - the store against [[PqCodebook.encodeJvm]] (codes verbatim, decode
 *    = codebook concat) and the payload-kind guards (no storage ever
 *    absorbs another's codes — mixed scoring scales),
 *  - the ADC scorer's bit-identity to [[VecStore.distQuery]] (the
 *    lookup-table path must be an optimization, never a reranking) and
 *    both against the exact kernel over DECODED vectors (tolerance: the
 *    per-subspace grouping reorders double additions),
 *  - recall of the PQ serving path (graph + exact rescore) vs exact
 *    ground truth, and the honesty rule that the RAW coarse ranking
 *    reads no better than its own rescore,
 *  - drift-free compaction (codes carry verbatim through rebuilds — the
 *    [[VecPayload]] rule; a PQ rebuild that re-encoded decoded floats
 *    would drift one codebook assignment per compaction),
 *  - storage as artifact identity INCLUDING the trained codebook
 *    (m/ksub and the book are stamp-matched on load; sq8/f32/pq never
 *    cross),
 *  - calibration through the rescored join against the exact corpus.
 */
class PqRoutedSpec extends AnyFunSuite {

  private val N = 6000
  private val Dim = 64
  private val NQueries = 60
  private val K = 10
  private val Shards = 16
  private val M = 8
  private val Ksub = 256

  private lazy val (ids, vecs, gen) = siftLikeDataset(seed = 779L, n = N, dim = Dim)
  private lazy val queries: Array[Array[Float]] =
    Array.tabulate(NQueries)(i => gen((N + i).toLong))

  private val cfg = NonLinearConfig.HNSWConfig(efConstruction = 100,
    maximumConnections = 40, maximumConnectionsZero = 80,
    efSearch = 64, metric = Algorithm.CosineSimilarity)

  private def df(range: Range) = {
    val s = spark
    import s.implicits._
    range.map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
  }

  private lazy val pq: RoutedAnnIndex =
    RoutedAnnIndex.build(df(0 until N), Dim, cfg, numShards = Shards,
      iters = 2, storage = StorageSpec.Pq(M, Ksub))

  private lazy val book: PqCodebook = pq.storage match {
    case NodeStorage.Pq(b) => b
    case other => fail(s"expected PQ storage, got $other")
  }

  test("StorageSpec parses and resolves: keys round-trip, bare pq splits from the dimension, bad kinds refuse") {
    assert(StorageSpec.resolve("f32", 64) == StorageSpec.F32)
    assert(StorageSpec.resolve("sq8", 64) == StorageSpec.Sq8)
    assert(StorageSpec.resolve("pq", 64) == StorageSpec.Pq(8, 256))
    assert(StorageSpec.resolve("pq", 768) == StorageSpec.Pq(96, 256))
    assert(StorageSpec.resolve("pq", 6) == StorageSpec.Pq(3, 256)) // dsub=2
    assert(StorageSpec.resolve("pq(m=4,ksub=16)", 64) == StorageSpec.Pq(4, 16))
    // the resolved key re-parses to itself (manifest identity round trip)
    val key = StorageSpec.Pq(8, 256).key
    assert(StorageSpec.resolve(key, 64) == StorageSpec.Pq(8, 256))
    intercept[IllegalArgumentException] { StorageSpec.resolve("pq(m=7,ksub=16)", 64) }
    intercept[IllegalArgumentException] { StorageSpec.resolve("int4", 64) }
    intercept[IllegalArgumentException] { StorageSpec.Pq(8, 257) } // > byte range
    // a RECOGNIZED pq form with out-of-range params surfaces the REAL
    // constraint, never "unknown storage" (review round 15)
    val e = intercept[IllegalArgumentException] {
      StorageSpec.resolve("pq(m=8,ksub=300)", 64)
    }
    assert(e.getMessage.contains("256"), e.getMessage)
  }

  test("PqVecStore pins: codes == encodeJvm, decode == codebook concat, payload guards, ADC scorer bit-identical to distQuery") {
    val b = PqCodebook.train(df(0 until 512), m = M, ksub = 64, iters = 2)
    val st = new PqVecStore(Algorithm.CosineSimilarity, b)
    (0 until 32).foreach(i => st.add(vecs(i)))
    (0 until 32).foreach { i =>
      val VecPayload.PqCode(codes) = st.payload(i)
      assert(codes.map(_ & 0xFF).toSeq == b.encodeJvm(vecs(i)).toSeq,
        s"stored codes diverge from encodeJvm at row $i")
      // decode = concat of each subspace's codebook entry
      val decoded = st.export(i)
      val exp = b.encodeJvm(vecs(i)).zipWithIndex.flatMap { case (c, s) =>
        b.codebooks(s)(c)
      }
      assert(decoded.toSeq == exp.toSeq, s"decode diverges at row $i")
    }
    // payload-kind guards: no storage absorbs another's codes
    val fs = new FloatVecStore(Algorithm.CosineSimilarity)
    intercept[IllegalStateException] { fs.addPayload(st.payload(0)) }
    val qs = new Sq8VecStore(Algorithm.CosineSimilarity)
    intercept[IllegalStateException] { qs.addPayload(st.payload(0)) }
    val st2 = new PqVecStore(Algorithm.CosineSimilarity, b)
    st2.addPayload(st.payload(0))
    assert(st2.payload(0) == st.payload(0), "PQ payload must carry verbatim")
    // ADC table path == direct path, bitwise, on every metric
    for (metric <- Seq(Algorithm.CosineSimilarity,
        Algorithm.DotProductSimilarity, Algorithm.EuclideanDistance)) {
      val ms = new PqVecStore(metric, b)
      (0 until 32).foreach(i => ms.add(vecs(i)))
      queries.take(8).foreach { q =>
        val scorer = ms.queryScorer(q)
        (0 until 32).foreach { i =>
          assert(scorer(i) == ms.distQuery(q, i),
            s"$metric: ADC scorer diverges from distQuery at node $i")
        }
      }
      // both against the exact kernel over DECODED vectors (grouping
      // reorders double adds — tolerance, not equality)
      val jvm = graft.functions.Similarity.jvm
      queries.take(4).foreach { q =>
        (0 until 8).foreach { i =>
          val d = ms.export(i)
          val exp = metric match {
            case Algorithm.EuclideanDistance => jvm.sqEuclidean(q, d)
            case Algorithm.DotProductSimilarity => -jvm.dot(q, d)
            case _ => -jvm.cosine(q, d)
          }
          assert(math.abs(ms.distQuery(q, i) - exp) <= 1e-9 * math.max(1.0, math.abs(exp)),
            s"$metric: distQuery strays from the kernel over decoded values")
        }
      }
      // node-node distances likewise
      (0 until 8).foreach { i =>
        val d1 = ms.export(i); val d2 = ms.export((i + 5) % 32)
        val exp = metric match {
          case Algorithm.EuclideanDistance => jvm.sqEuclidean(d1, d2)
          case Algorithm.DotProductSimilarity => -jvm.dot(d1, d2)
          case _ => -jvm.cosine(d1, d2)
        }
        assert(math.abs(ms.distNodes(i, (i + 5) % 32) - exp) <=
          1e-9 * math.max(1.0, math.abs(exp)),
          s"$metric: distNodes strays from the kernel over decoded values")
      }
    }
  }

  test("PQ routed serving path (graph + exact rescore at the wider slack) reaches exact-grade recall; raw ADC ranking reads lower") {
    val s = spark
    import s.implicits._
    val qdf = queries.zipWithIndex
      .map { case (v, i) => (100000L + i, v.toSeq) }.toSeq.toDF("qid", "qv")
    val exact = df(0 until N)
    def recallOf(res: Map[Long, Seq[Long]]): Double = {
      val rs = queries.zipWithIndex.map { case (v, i) =>
        val exp = bruteTopK(cfg.metric, ids, vecs, v, K).map(_._1)
        recallAtK(exp, res(100000L + i))
      }
      rs.sum / rs.length
    }
    def ranked(dfr: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      dfr.select("qid", "cid", "rank").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) =>
          q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
    // served path at exhaustive probes: ADC beam + exact rescore at the
    // PQ default shortlist (k + NodeStorage.Pq.rescoreSlack)
    val served = ranked(pq.topKJoinRescored(qdf, "qid", "qv", K, Shards, exact))
    val rServed = recallOf(served)
    info(f"pq exhaustive rescored recall@$K = $rServed%.4f")
    assert(rServed >= 0.93,
      f"pq+rescored exhaustive recall@$K = $rServed%.4f < 0.93")
    // RAW coarse ranking can never beat its own exact rescore
    val raw = ranked(pq.topKJoin(qdf, "qid", "qv", K, Shards))
    val rRaw = recallOf(raw)
    info(f"pq exhaustive RAW coarse recall@$K = $rRaw%.4f")
    assert(rRaw <= rServed + 1e-9,
      "raw PQ coarse ranking cannot outperform its own exact rescore")
    // PQ coarse error really is wider than SQ8's at the same geometry —
    // the measured reason its rescore slack is wider
    assert(rRaw < 1.0, "PQ coarse ranking read perfect — slack test is vacuous")
  }

  test("maintenance carries codes verbatim: compaction re-encodes NOTHING, tombstones filter, storedRows carried") {
    val base = RoutedAnnIndex.build(df(0 until 5000), Dim, cfg,
      numShards = Shards, iters = 2, storage = StorageSpec.Pq(M, Ksub))
    try {
      val baseBook = base.storage.asInstanceOf[NodeStorage.Pq].book
      // pre-compaction payloads per id (graph codes; tails are float)
      val before: Map[Long, Seq[Int]] = base.shards
        .flatMap(RoutedAnnIndex.payloadsOf(_)).collect().map {
          case (id, VecPayload.PqCode(c)) => id -> c.map(_ & 0xFF).toSeq
          case (id, other) => fail(s"non-PQ payload $other for $id")
        }.toMap
      // overlay append: tails stay exact float (LSM memtable analog)
      val a = base.append(df(5000 until 5500)).get
      try {
        assert(a.quantized && a.patchedRows == 500L)
        assert(a.storedRows == 5500L && a.storedRows == a.measuredStoredRows)
        assert(a.storage.asInstanceOf[NodeStorage.Pq].book eq baseBook,
          "maintenance must carry the trained codebook, never retrain")
        // force compaction: overlay past the patch fraction
        val big = df(0 until 4000).selectExpr("id + 1000000 as id", "key")
        val c = a.append(big).get
        try {
          assert(c.patchedRows == 0L && c.quantized)
          assert(c.storedRows == c.measuredStoredRows)
          // drift-free: every pre-existing graph node's codes are
          // BYTE-IDENTICAL after the rebuild (carried via VecPayload),
          // and every folded-in float row encodes under the SAME book
          val after: Map[Long, Seq[Int]] = c.shards
            .flatMap(RoutedAnnIndex.payloadsOf(_)).collect().map {
              case (id, VecPayload.PqCode(cd)) => id -> cd.map(_ & 0xFF).toSeq
              case (id, other) => fail(s"non-PQ payload $other for $id post-compaction")
            }.toMap
          before.foreach { case (id, codes) =>
            assert(after(id) == codes,
              s"compaction re-encoded node $id — quantization drift")
          }
          (5000 until 5010).foreach { i =>
            assert(after(ids(i)) == baseBook.encodeJvm(vecs(i)).toSeq,
              s"folded tail row ${ids(i)} not encoded under the carried book")
          }
        } finally c.unpersist()
        // tombstone tier on the PQ index
        val t = a.delete(Seq(ids(0), ids(1)))
        assert(t.tier == "tombstone" && t.index.quantized)
        queries.take(5).foreach { q =>
          assert(!t.index.search(q, K, Shards).map(_._1)
            .exists(Set(ids(0), ids(1))), "tombstoned id surfaced from pq shards")
        }
      } finally a.unpersist()
    } finally base.unpersist()
  }

  test("storage (incl. the trained codebook) is artifact identity; pq round trip restores byte-identical answers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-artifacts").toString
    RoutedAnnIndex.save(pq, dir, sourceStamp = "v1")
    // a pq artifact refuses float and sq8 configs, and a different split
    assert(RoutedAnnIndex.load(spark, dir, cfg, "v1", iters = 2).isEmpty,
      "a pq artifact must not load as a float index")
    assert(RoutedAnnIndex.load(spark, dir, cfg, "v1", iters = 2,
      storage = StorageSpec.Sq8).isEmpty,
      "a pq artifact must not load as an sq8 index")
    assert(RoutedAnnIndex.load(spark, dir, cfg, "v1", iters = 2,
      storage = StorageSpec.Pq(4, Ksub)).isEmpty,
      "a pq artifact must not load under a different subspace split")
    val loaded = RoutedAnnIndex.load(spark, dir, cfg, "v1", iters = 2,
      storage = StorageSpec.Pq(M, Ksub))
    assert(loaded.isDefined, "pq artifacts failed to load")
    try {
      assert(loaded.get.quantized && loaded.get.storedRows == pq.storedRows)
      val lb = loaded.get.storage.asInstanceOf[NodeStorage.Pq].book
      assert(lb.codebooks.flatten.flatten.map(java.lang.Float.floatToRawIntBits)
          .toSeq == book.codebooks.flatten.flatten
          .map(java.lang.Float.floatToRawIntBits).toSeq,
        "restored codebook is not bit-identical")
      queries.take(10).foreach { q =>
        assert(loaded.get.search(q, K, 8) == pq.search(q, K, 8),
          "restored pq index diverges from the built one")
      }
    } finally loaded.get.unpersist()
  }

  test("shard layout version gates loads: a manifest from another layout refuses with an explicit reason, never a deser exception") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val f32 = RoutedAnnIndex.build(df(0 until 500), Dim, cfg, 4, iters = 2)
    try {
      RoutedAnnIndex.save(f32, dir, sourceStamp = "v1")
      assert(RoutedAnnIndex.load(spark, dir, cfg, "v1", iters = 2).isDefined)
      // rewrite the manifest as a pre-upgrade layout
      val p = java.nio.file.Paths.get(dir, "routed_manifest.json")
      val txt = java.nio.file.Files.readString(p)
      java.nio.file.Files.writeString(p, txt.replace(
        "\"layout\" : " + RoutedAnnIndex.ShardLayoutVersion,
        "\"layout\" : 2"))
      assert(RoutedAnnIndex.load(spark, dir, cfg, "v1", iters = 2).isEmpty,
        "a layout-2 artifact must refuse to load into layout-" +
          RoutedAnnIndex.ShardLayoutVersion)
      // a manifest with NO layout field (pre-round-14 artifact) refuses too
      java.nio.file.Files.writeString(p, txt.replaceAll(
        "\\s*\"layout\" : [0-9]+,", ""))
      assert(RoutedAnnIndex.load(spark, dir, cfg, "v1", iters = 2).isEmpty,
        "a pre-layout-field artifact must refuse to load")
    } finally f32.unpersist()
  }

  test("drift-guard recluster round-trips the spec and RETRAINS the codebook (the streaming rebuild path)") {
    val s = spark
    import s.implicits._
    val base = RoutedAnnIndex.build(df(0 until 2000), Dim, cfg,
      numShards = 8, iters = 2, storage = StorageSpec.Pq(M, 64))
    try {
      val baseBook = base.storage.asInstanceOf[NodeStorage.Pq].book
      // a heavily shifted batch trips the drift guard → None → the
      // caller (StreamingIngest) reclusters via build(..., old.spec)
      val drifted = (0 until 200)
        .map(i => (1000000L + i, vecs(i).map(_ + 25f).toSeq))
        .toDF("id", "key")
        .selectExpr("id", "cast(key as array<float>) as key")
      assert(base.append(drifted).isEmpty,
        "a distribution-shifted batch must trip the drift guard")
      assert(base.spec == StorageSpec.Pq(M, 64),
        "the handle must expose its storage spec for the rebuild")
      val union = df(0 until 2000).union(drifted)
      val rebuilt = RoutedAnnIndex.build(union, Dim, cfg, 8, iters = 2,
        replicationEps = 0.0, maxReplicas = 2, storage = base.spec,
        frozenCentroids = None)
      try {
        val newBook = rebuilt.storage.asInstanceOf[NodeStorage.Pq].book
        assert(rebuilt.spec == base.spec, "spec must survive the recluster")
        assert(!(newBook eq baseBook) && !java.util.Arrays.equals(
          newBook.flatBook, baseBook.flatBook),
          "a recluster must RETRAIN the codebook (books drift with data)")
        // the rebuilt index serves the shifted rows
        assert(rebuilt.search(drifted.head.getSeq[Float](1).toArray, 1, 8)
          .headOption.exists(_._1 == 1000000L))
      } finally rebuilt.unpersist()
    } finally base.unpersist()
  }

  test("codebook wire form is the flat floats; shards of one index intern to ONE in-memory book on deserialization") {
    val b = PqCodebook.train(df(0 until 256), m = M, ksub = 16, iters = 1)
    def serialize(o: AnyRef): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close()
      bos.toByteArray
    }
    def deserialize(bs: Array[Byte]): AnyRef = {
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bs))
      try ois.readObject() finally ois.close()
    }
    val wire = serialize(b)
    // wire form ≈ the flat float data (d·ksub·4 B), not the nested
    // array-of-arrays layout (~2.4× in headers and refs) — the term a
    // per-shard book copy costs on disk
    assert(wire.length < b.flatBook.length * 4 * 1.3 + 4096,
      s"codebook serialized to ${wire.length} B for " +
        s"${b.flatBook.length * 4} B of float data")
    val c1 = deserialize(wire).asInstanceOf[PqCodebook]
    val c2 = deserialize(wire).asInstanceOf[PqCodebook]
    assert(c1 eq c2,
      "two deserializations of one book must intern to ONE instance " +
        "(an executor holding many shards must hold one book)")
    assert(java.util.Arrays.equals(c1.flatBook, b.flatBook),
      "interned book must be bit-identical to the trained one")
    // a store built on the restored book scores identically
    val s1 = new PqVecStore(Algorithm.CosineSimilarity, b)
    val s2 = new PqVecStore(Algorithm.CosineSimilarity, c1)
    (0 until 16).foreach { i => s1.add(vecs(i)); s2.add(vecs(i)) }
    queries.take(4).foreach { q =>
      (0 until 16).foreach(i =>
        assert(s1.distQuery(q, i) == s2.distQuery(q, i)))
    }
  }

  test("calibrate answers for the PQ path: exact corpus required, curve through the rescore, 1.0 exhaustive") {
    intercept[IllegalArgumentException] { pq.calibrate(nQueries = 8, k = 5) }
    val cal = pq.calibrate(nQueries = 32, k = K, ladderIn = Seq(2, 8),
      exact = Some(df(0 until N)))
    assert(cal.recallK == K && cal.recallCurve.nonEmpty && cal.quantized)
    assert(cal.workloadFp.startsWith("self:"),
      "self-sample calibration must stamp a self: workload fingerprint")
    val byProbes = cal.recallCurve.map { case (p, r, _) => p -> r }.toMap
    assert(byProbes(2) <= byProbes(Shards) + 1e-9)
    assert(byProbes(Shards) >= 0.90,
      f"exhaustive pq curve point ${byProbes(Shards)}%.4f < 0.90")
    assert(cal.probesFor(1.0) == Shards)
  }

  test("lowDimPqWarning: only a pruned-probe, untargeted PQ index below the measured dim threshold warns (round-16 guard)") {
    val pqSpec = StorageSpec.Pq(8, 256)
    // the measured trap: low dim + pruned probes + no recall target
    val warned = StorageSpec.lowDimPqWarning(pqSpec, 64,
      probes = 8, numShards = 16, recallTarget = None)
    assert(warned.exists(_.contains("sq8")),
      "the warning must name the measured alternative")
    // safe configurations stay silent:
    assert(StorageSpec.lowDimPqWarning(pqSpec, 768, 8, 16, None).isEmpty,
      "high-dim PQ is the design point, never warned")
    assert(StorageSpec.lowDimPqWarning(pqSpec,
      StorageSpec.PqLowDimWarnBelow, 8, 16, None).isEmpty,
      "the threshold dim itself is outside the warned region")
    assert(StorageSpec.lowDimPqWarning(pqSpec, 64, 16, 16, None).isEmpty,
      "exhaustive probes rescore to exact ranking — no trap")
    assert(StorageSpec.lowDimPqWarning(pqSpec, 64, 8, 16, Some(0.9)).isEmpty,
      "a recall target prices the PQ error into the measured curve")
    assert(StorageSpec.lowDimPqWarning(StorageSpec.Sq8, 64, 8, 16, None).isEmpty
      && StorageSpec.lowDimPqWarning(StorageSpec.F32, 64, 8, 16, None).isEmpty,
      "only PQ storage is in scope")
  }
}
