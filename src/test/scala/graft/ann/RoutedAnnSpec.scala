package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.{Algorithm, NonLinearConfig}

/**
 * Coarse-routed sharded HNSW ([[RoutedAnnIndex]]): content-based shard
 * assignment (k-means routing centroids) must let a query reach reference
 * recall while probing a small fraction of the shards — the property hash
 * sharding can't have (hash shards are statistically identical, so every
 * query must fan out to all of them). 10 000 × 128-d over 64 shards
 * ≈ 156 vectors/shard; the 200k × 64-shard scale datapoint lives in
 * ScaleRecall / SCALE.md.
 */
class RoutedAnnSpec extends AnyFunSuite {

  private val N = 10000
  private val Dim = 128
  private val NQueries = 100
  private val K = 50
  private val Shards = 64

  private lazy val (ids, vecs, gen) = siftLikeDataset(seed = 4242L, n = N, dim = Dim)
  private lazy val queries: Array[Array[Float]] =
    Array.tabulate(NQueries)(i => gen((N + i).toLong))

  private val cfg = NonLinearConfig.HNSWConfig(efConstruction = 100,
    maximumConnections = 40, maximumConnectionsZero = 80,
    efSearch = 16, metric = Algorithm.CosineSimilarity)

  private lazy val index: RoutedAnnIndex = {
    val s = spark
    import s.implicits._
    val df = ids.indices.map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
    RoutedAnnIndex.build(df, Dim, cfg, numShards = Shards, iters = 3)
  }

  private def meanRecall(probes: Int): Double = {
    val rs = queries.map { q =>
      val got = index.search(q, K, probes).map(_._1)
      val exp = bruteTopK(cfg.metric, ids, vecs, q, K).map(_._1)
      recallAtK(exp, got)
    }
    rs.sum / rs.length
  }

  test("exhaustive probes (= numShards) reach reference recall — the correctness identity") {
    assert(index.numShards == Shards)
    val r = meanRecall(Shards)
    info(f"routed exhaustive recall@$K = $r%.4f")
    assert(r >= 0.90, f"exhaustive recall@$K = $r%.4f < 0.90")
  }

  test("p << shards keeps recall >= 0.90: routing prunes, hash sharding couldn't") {
    // K=50 over 10k rows is ~a whole shard's worth of neighbors per query
    // (156 rows/shard) — the HARDEST probes-to-K ratio this index sees;
    // at the 200k ScaleRecall datapoint each shard holds ~3k rows and the
    // same probe fraction recalls more. 16/64 = 4x pruning here.
    val r16 = meanRecall(16)
    info(f"probes=16/64 recall@$K = $r16%.4f (25%% of shards searched)")
    assert(r16 >= 0.90, f"probes=16 recall@$K = $r16%.4f < 0.90")
  }

  test("recall is monotone in probes (probe sets are nested prefixes)") {
    // probeShards(p) is the p-prefix of one deterministic ranking, so the
    // candidate set grows with p and the merged top-k can only improve
    val r1 = meanRecall(1)
    val r8 = meanRecall(8)
    val rAll = meanRecall(Shards)
    info(f"recall@$K: probes 1 -> $r1%.4f, 8 -> $r8%.4f, $Shards -> $rAll%.4f")
    assert(r1 <= r8 + 1e-12 && r8 <= rAll + 1e-12)
    // and pruning must be REAL: the single nearest shard alone cannot hold
    // every query's full top-50 on a 64-shard layout
    assert(r1 < 1.0, "probes=1 scored perfect recall — routing isn't pruning anything")
  }

  test("boundary replication (SPANN closure) lifts small-probe recall; merge dedupes replicas") {
    val s = spark
    import s.implicits._
    val df = ids.indices.map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
    val rep = RoutedAnnIndex.build(df, Dim, cfg, numShards = Shards,
      iters = 3, replicationEps = 0.15, maxReplicas = 2)
    try {
      def recall(idx: RoutedAnnIndex, probes: Int): Double = {
        val rs = queries.map { q =>
          val got = idx.search(q, K, probes).map(_._1)
          // a replicated id must never occupy two result slots
          assert(got.distinct.length == got.length, "duplicate id in merged top-k")
          recallAtK(bruteTopK(cfg.metric, ids, vecs, q, K).map(_._1), got)
        }
        rs.sum / rs.length
      }
      val base4 = meanRecall(4) // the eps=0 index from the shared fixture
      val rep4 = recall(rep, 4)
      info(f"probes=4/64 recall@$K: eps=0 -> $base4%.4f, eps=0.15 -> $rep4%.4f")
      assert(rep4 > base4 + 0.01,
        f"replication should lift small-probe recall: $base4%.4f -> $rep4%.4f")
      // exhaustive stays exact-equivalent: same id set as the unreplicated
      // exhaustive search (replicas dedupe away)
      queries.take(10).foreach { q =>
        assert(rep.search(q, K, Shards).map(_._1).toSet ==
          index.search(q, K, Shards).map(_._1).toSet,
          "replication changed the exhaustive result set")
      }
    } finally rep.unpersist()
  }

  test("save/load round trip: restored index answers identically; any mismatch rebuilds") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-routed-artifacts").toString
    RoutedAnnIndex.save(index, dir, sourceStamp = "v1")
    val loaded = RoutedAnnIndex.load(s, dir, cfg, "v1", iters = 3)
    assert(loaded.isDefined, "artifacts failed to load")
    try {
      assert(loaded.get.centroids.map(_.toSeq).toSeq ==
        index.centroids.map(_.toSeq).toSeq, "centroids not bit-identical")
      queries.take(10).foreach { q =>
        assert(loaded.get.search(q, K, 8) == index.search(q, K, 8),
          "restored routed index diverges from the built one")
      }
    } finally loaded.get.unpersist()
    // staleness: wrong stamp, wrong config, wrong shard count — and wrong
    // BUILD PARAMS (iters, maxReplicas): an artifact built under a
    // different Lloyd-round count or replica cap is a different index
    // even at identical eps — all rebuild
    assert(RoutedAnnIndex.load(s, dir, cfg, "v2", iters = 3).isEmpty)
    assert(RoutedAnnIndex.load(s, dir, cfg.copy(efSearch = 99), "v1",
      iters = 3).isEmpty)
    assert(RoutedAnnIndex.load(s, dir, cfg, "v1", iters = 2).isEmpty,
      "iters mismatch must invalidate the artifact")
    assert(RoutedAnnIndex.load(s, dir, cfg, "v1", iters = 3,
      maxReplicas = 5).isEmpty,
      "maxReplicas mismatch must invalidate the artifact")
    val df = ids.indices.take(500).map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
    val rebuilt = RoutedAnnIndex.buildOrLoad(df, Dim, cfg, numShards = 4,
      dir = dir, sourceStamp = "v1")
    try assert(rebuilt.numShards == 4,
      "shard-count mismatch must rebuild, not load the stale artifact")
    finally rebuilt.unpersist()
  }

  test("topKJoin (batch kNN through routed shards) equals the single-query path at every probe count") {
    val s = spark
    import s.implicits._
    val qdf = queries.take(20).zipWithIndex
      .map { case (v, i) => (100000L + i, v.toSeq) }.toSeq.toDF("qid", "qv")
    for (probes <- Seq(2, 8, Shards)) {
      val got = index.topKJoin(qdf, "qid", "qv", K, probes)
        .select("qid", "cid", "rank").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
      queries.take(20).zipWithIndex.foreach { case (v, i) =>
        val single = index.search(v, K, probes).map(_._1)
        assert(got(100000L + i) == single,
          s"batch join diverges from single-query search at probes=$probes")
      }
    }
  }

  test("topKJoin with an accept filter equals the filtered single-query path (round 14)") {
    val s = spark
    import s.implicits._
    // Bloom over the even ids — the same sketch-backed IdFilter the
    // engine's predicate arm ships; both paths see the IDENTICAL accept
    // function, so batch and single-query must agree bit-for-bit at every
    // probe count (false positives included — post-verification is the
    // CALLER's contract, pinned by the embed_topk_join_routed_filtered
    // oracle, not this equivalence)
    val evens = ids.filter(_ % 2 == 0)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(evens.length, 0.001)
    evens.foreach(bf.putLong)
    val filter = IdFilter.Bloom(bf)
    val qdf = queries.take(10).zipWithIndex
      .map { case (v, i) => (100000L + i, v.toSeq) }.toSeq.toDF("qid", "qv")
    for (probes <- Seq(4, Shards)) {
      val got = index.topKJoin(qdf, "qid", "qv", K, probes, filter)
        .select("qid", "cid", "rank").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
      queries.take(10).zipWithIndex.foreach { case (v, i) =>
        val single = index.search(v, K, probes, filter).map(_._1)
        assert(got(100000L + i) == single,
          s"filtered batch join diverges from filtered single-query search at probes=$probes")
        assert(single.nonEmpty && single.forall(bf.mightContainLong),
          "a rejected id surfaced through the in-graph filter")
      }
    }
  }

  test("append (overlay patch): appended rows are found exactly; counts and guards behave") {
    val s = spark
    import s.implicits._
    val base = ids.indices.take(9000).map(i => (ids(i), vecs(i).toSeq))
      .toDF("id", "key")
    val idx = RoutedAnnIndex.build(base, Dim, cfg, numShards = Shards, iters = 3)
    try {
      assert(idx.meanAssignDist > 0.0, "build must record the assignment objective")
      // guards FIRST (refusals leave the index untouched; a successful
      // append releases the predecessor's shard cache):
      // DRIFT — a far-away manifold (constant offset) must refuse
      val drifted = (0 until 500)
        .map(i => (100000L + i, Array.fill(Dim)(10.0f).toSeq)).toDF("id", "key")
      assert(idx.append(drifted).isEmpty, "drift guard must trip on a shifted batch")
      // in-distribution tail: the held-back 1000 rows of the same manifold
      val tail = ids.indices.drop(9000).map(i => (ids(i), vecs(i).toSeq))
        .toDF("id", "key")
      val appended = idx.append(tail)
      assert(appended.isDefined, "in-distribution append must pass the drift guard")
      val a = appended.get
      try {
        assert(a.patchedRows == 1000L)
        assert(a.storedRows == 10000L, "overlay rows must count in storedRows")
        // storedRows is CARRIED through maintenance (no per-call job) —
        // the carried field must agree with the shard-derived measurement
        assert(a.storedRows == a.measuredStoredRows,
          "carried storedRows diverges from the measured count after append")
        // every appended vector finds ITSELF at top-1 (overlay is exact
        // brute force, probes=1 routes to its own shard)
        (9000 until 9100).foreach { i =>
          val top = a.search(vecs(i), 1, 1)
          assert(top.headOption.exists(_._1 == ids(i)),
            s"appended row ${ids(i)} not found in its own shard")
        }
        // pre-append rows still answer through the wrapped graphs
        val q = queries.head
        assert(a.search(q, K, Shards).nonEmpty)
        // determinism
        assert(a.search(q, K, 8) == a.search(q, K, 8))
        // empty append is the same index, not a new overlay
        assert(a.append(tail.limit(0)).exists(_ eq a))
        // PATCH FRACTION — a batch pushing overlays past 25% COMPACTS:
        // per-shard local graph rebuilds absorb the tails, and the result
        // is IDENTICAL to a frozen-centroid build over the union
        // (id-ascending insertion both ways)
        val huge = ids.indices.take(9000).map(i =>
          (1000000L + i, vecs(i).toSeq)).toDF("id", "key")
        val compacted = a.append(huge).get
        try {
          assert(compacted.patchedRows == 0L, "compaction must absorb all tails")
          assert(compacted.storedRows == 19000L)
          assert(compacted.storedRows == compacted.measuredStoredRows,
            "carried storedRows diverges from the measured count after compaction")
          val all = ids.indices.map(i => (ids(i), vecs(i).toSeq))
            .toDF("id", "key").union(huge)
          val twin = RoutedAnnIndex.build(all, Dim, cfg, Shards, iters = 3,
            replicationEps = 0.0, maxReplicas = 2,
            storage = graft.ann.StorageSpec.F32, frozenCentroids = Some(a.centroids))
          try queries.take(20).foreach { q =>
            assert(compacted.search(q, K, 8) == twin.search(q, K, 8),
              "compacted graphs diverge from the frozen-centroid union build")
          } finally twin.unpersist()
        } finally compacted.unpersist()
      } finally a.unpersist()
    } finally idx.unpersist()
  }

  test("append survives the artifact round trip (overlay shards serialize)") {
    val s = spark
    import s.implicits._
    val base = ids.indices.take(5000).map(i => (ids(i), vecs(i).toSeq))
      .toDF("id", "key")
    val idx = RoutedAnnIndex.build(base, Dim, cfg, numShards = 16, iters = 2)
    val tail = ids.indices.slice(5000, 5500).map(i => (ids(i), vecs(i).toSeq))
      .toDF("id", "key")
    val a = idx.append(tail).get
    val dir = java.nio.file.Files.createTempDirectory("graft-routed-patched").toString
    RoutedAnnIndex.save(a, dir, sourceStamp = "p1")
    val loaded = RoutedAnnIndex.load(s, dir, cfg, "p1", iters = 2)
    assert(loaded.isDefined)
    try {
      assert(loaded.get.patchedRows == 500L)
      assert(loaded.get.meanAssignDist == a.meanAssignDist,
        "drift baseline must survive the round trip bit-exactly")
      queries.take(10).foreach { q =>
        assert(loaded.get.search(q, K, 8) == a.search(q, K, 8),
          "restored patched index diverges")
      }
    } finally { loaded.get.unpersist(); a.unpersist(); idx.unpersist() }
  }

  test("delete (tombstone tier): hidden everywhere, zero structural work, resurrect on re-append") {
    val s = spark
    import s.implicits._
    val victims = (0 until 200).map(ids(_)).toSet
    val out = index.delete(victims.toSeq)
    assert(out.tier == "tombstone", "a 2% delete must tombstone, not compact")
    assert(out.touchedShards.isEmpty, "tombstoning is a manifest-only change")
    val del = out.index
    assert(del.shards eq index.shards,
      "tombstone-only delete must share the predecessor's shard RDD")
    assert(del.tombstones.length == 200)
    // hidden from every read path: single-query, batch join, extraction
    (0 until 20).foreach { i =>
      val top = del.search(vecs(i), 1, 1)
      assert(top.headOption.forall(_._1 != ids(i)),
        s"tombstoned id ${ids(i)} surfaced from search")
    }
    val qdf = (0 until 10).map(i => (100000L + i, vecs(i).toSeq)).toDF("qid", "qv")
    val joined = del.topKJoin(qdf, "qid", "qv", K, Shards)
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(joined.intersect(victims).isEmpty,
      "tombstoned id surfaced from topKJoin")
    assert(del.rows.map(_._1).filter(victims.contains).count() == 0,
      "tombstoned id surfaced from rows extraction")
    // survivors: exhaustive search equals brute force over the live set
    val liveIds = ids.filterNot(victims.contains)
    val liveVecs = ids.indices.collect {
      case i if !victims.contains(ids(i)) => vecs(i) }.toArray
    queries.take(10).foreach { q =>
      val got = del.search(q, K, Shards).map(_._1)
      val exp = bruteTopK(cfg.metric, liveIds, liveVecs, q, K).map(_._1)
      assert(recallAtK(exp, got) >= 0.90,
        "survivor recall collapsed under tombstones")
    }
    // deleting already-tombstoned ids is a no-op on the set
    val again = del.delete(victims.take(10).toSeq)
    assert(again.tier == "tombstone" && (again.index eq del),
      "re-deleting tombstoned ids must return the same index")
    // re-appending a tombstoned id clears its tombstone (same content id
    // = the same vector) and it serves again
    val back = (0 until 5).map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
    val rev = del.append(back).get
    assert(rev.tombstones.length == 195, "re-appended ids must leave the tombstone set")
    (0 until 5).foreach { i =>
      assert(rev.search(vecs(i), 1, 1).headOption.exists(_._1 == ids(i)),
        s"resurrected id ${ids(i)} not found")
    }
    // do NOT unpersist del/rev here: they share the suite-wide fixture's
    // shard RDD (tombstone-only wrappers; rev's overlay RDD leaks a few
    // tail arrays for the session — the suite pattern)
  }

  test("delete (compaction tier): guard trips route to local rebuilds identical to a filtered build") {
    val s = spark
    import s.implicits._
    val base = ids.indices.take(4000).map(i => (ids(i), vecs(i).toSeq))
      .toDF("id", "key")
    val idx = RoutedAnnIndex.build(base, Dim, cfg, numShards = 16, iters = 2)
    try {
      // 30% deleted > DefaultTombstoneLimit (10%) -> compaction
      val victims = (0 until 1200).map(ids(_))
      val out = idx.delete(victims)
      assert(out.tier == "compact", "a 30% delete must compact")
      assert(out.touchedShards.nonEmpty)
      val del = out.index
      try {
        assert(del.tombstones.isEmpty, "compaction must clear the tombstone set")
        assert(del.storedRows == 2800L, "compaction must physically remove rows")
        assert(del.storedRows == del.measuredStoredRows,
          "carried storedRows diverges from the measured count after delete compaction")
        // identical to a frozen-centroid build over the survivors
        val survivors = ids.indices.slice(1200, 4000)
          .map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
        val twin = RoutedAnnIndex.build(survivors, Dim, cfg, 16, iters = 2,
          replicationEps = 0.0, maxReplicas = 2,
          storage = graft.ann.StorageSpec.F32, frozenCentroids = Some(idx.centroids))
        try queries.take(20).foreach { q =>
          assert(del.search(q, K, 8) == twin.search(q, K, 8),
            "compacted shards diverge from the frozen-centroid filtered build")
        } finally twin.unpersist()
        // the absolute cap also routes to compaction, fraction regardless
        val capped = del.delete(Seq(del.rows.first()._1),
          tombstoneLimit = 1.0, maxTombstones = 0)
        assert(capped.tier == "compact",
          "maxTombstones cap must force compaction")
        capped.index.unpersist()
      } finally del.unpersist()
    } finally idx.unpersist()
  }

  test("delete under boundary replication: every replica of a deleted id is hidden, then physically removed") {
    val s = spark
    import s.implicits._
    val base = ids.indices.take(4000).map(i => (ids(i), vecs(i).toSeq))
      .toDF("id", "key")
    val rep = RoutedAnnIndex.build(base, Dim, cfg, numShards = 16,
      iters = 2, replicationEps = 0.15, maxReplicas = 2)
    try {
      val physical = rep.storedRows
      assert(physical > 4000L, "replication fixture must actually replicate")
      val victims = (0 until 100).map(ids(_)).toSet
      // tombstone tier: the filter is BY ID, so every replica copy is
      // hidden at once — no per-shard bookkeeping can miss one
      val t = rep.delete(victims.toSeq)
      assert(t.tier == "tombstone")
      queries.take(10).foreach { q =>
        assert(t.index.search(q, K, 16).map(_._1).toSet
          .intersect(victims).isEmpty, "a replica of a tombstoned id surfaced")
      }
      // compaction: pass 1 finds EVERY shard holding a victim (replicas
      // included), pass 2 removes all copies — extraction sees none and
      // the physical row count drops by at least the replica count
      val extraVictim = ids(200)
      val allDead = victims + extraVictim // local: the RDD closure must not capture the suite
      val c = t.index.delete(Seq(extraVictim), maxTombstones = 0)
      assert(c.tier == "compact")
      try {
        assert(c.index.tombstones.isEmpty)
        assert(c.index.storedRows < physical)
        assert(c.index.rows.map(_._1).filter(allDead.contains).count() == 0,
          "a deleted id's replica survived compaction")
        queries.take(10).foreach { q =>
          val got = c.index.search(q, K, 16).map(_._1)
          assert(got.distinct.length == got.length,
            "duplicate id in post-compaction merged top-k")
          assert(!got.exists(allDead.contains))
        }
      } finally c.index.unpersist()
    } finally rep.unpersist()
  }

  test("tombstones and overlays survive the artifact round trip; incremental saves cost what changed") {
    val s = spark
    import s.implicits._
    val base = ids.indices.take(3000).map(i => (ids(i), vecs(i).toSeq))
      .toDF("id", "key")
    val idx = RoutedAnnIndex.build(base, Dim, cfg, numShards = 8, iters = 2)
    val tail = ids.indices.slice(3000, 3300).map(i => (ids(i), vecs(i).toSeq))
      .toDF("id", "key")
    val out = idx.appendOutcome(tail).get
    val a = out.index
    val del = a.delete((0 until 50).map(ids(_))).index
    val dir = java.nio.file.Files.createTempDirectory("graft-routed-lsm").toString
    // full save, then verify the LAYERED layout: frozen graphs in s<i>.bin,
    // overlay tails in p<i>.bin — so an incremental append-save can write
    // tails alone (∝ batch) while the graph files stay untouched
    RoutedAnnIndex.save(del, dir, sourceStamp = "lsm1")
    val pFiles = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("p")).toSet
    assert(pFiles.nonEmpty, "overlay tails must persist in their own p<i>.bin files")
    val loaded = RoutedAnnIndex.load(s, dir, cfg, "lsm1", iters = 2)
    assert(loaded.isDefined)
    try {
      assert(loaded.get.patchedRows == 300L)
      assert(loaded.get.tombstones.toSeq == del.tombstones.toSeq,
        "tombstones must survive the round trip")
      queries.take(10).foreach { q =>
        assert(loaded.get.search(q, K, 8) == del.search(q, K, 8),
          "restored LSM state diverges")
      }
    } finally loaded.get.unpersist()
    // INCREMENTAL save: append more, rewrite only the touched shards'
    // tail files under a new stamp — graph files must not be rewritten
    val sMtimes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("s")).map(f => f.getName -> f.lastModified).toMap
    val tail2 = ids.indices.slice(3300, 3400).map(i => (ids(i), vecs(i).toSeq))
      .toDF("id", "key")
    val out2 = del.appendOutcome(tail2).get
    RoutedAnnIndex.save(out2.index, dir, "lsm2", Some(out2.touchedShards))
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("s")).foreach { f =>
      assert(f.lastModified == sMtimes(f.getName),
        s"incremental overlay save rewrote graph file ${f.getName}")
    }
    val loaded2 = RoutedAnnIndex.load(s, dir, cfg, "lsm2", iters = 2)
    assert(loaded2.isDefined, "incrementally saved artifact must load")
    try {
      assert(loaded2.get.patchedRows == 400L)
      queries.take(10).foreach { q =>
        assert(loaded2.get.search(q, K, 8) == out2.index.search(q, K, 8),
          "incrementally saved LSM state diverges")
      }
    } finally {
      loaded2.get.unpersist(); out2.index.unpersist(); idx.unpersist()
    }
  }

  test("calibrate: measured curve is sane and probesFor picks the cheapest point meeting the target") {
    val cal = index.calibrate(nQueries = 64, k = K, seed = 99L)
    val curve = cal.recallCurve.toSeq
    assert(curve.nonEmpty, "calibration must produce a curve")
    assert(curve.map(_._1) == curve.map(_._1).sorted, "ladder must ascend")
    assert(curve.last._1 == Shards, "the top ladder point is exhaustive")
    // exhaustive probes measure the graph's own recall ceiling vs EXACT
    // brute-force ground truth — the spec corpus clears 0.90 by a margin
    assert(curve.last._2 >= 0.90,
      f"exhaustive calibrated recall ${curve.last._2}%.4f < 0.90")
    // ~monotone in probes (nested probe-set prefixes; allow sample noise)
    curve.sliding(2).foreach {
      case Seq((pa, a, _), (pb, b, _)) =>
        assert(b >= a - 0.02, f"recall fell $a%.4f -> $b%.4f at $pa -> $pb probes")
      case _ => ()
    }
    // stderr is a real number: positive below saturation, tiny vs mean
    curve.foreach { case (_, r, se) =>
      assert(se >= 0.0 && se <= 0.1, f"implausible stderr $se%.4f at $r%.4f")
    }
    // probesFor (raw mean mode) = the SMALLEST point meeting the target
    val p90 = cal.probesFor(0.90, conservative = false)
    assert(curve.find(_._2 >= 0.90).map(_._1).contains(p90))
    assert(p90 < Shards,
      "a 0.90 target on this corpus must prune (ScaleRecall measures " +
        "0.90+ well below exhaustive probes)")
    // conservative (default) selects by the lower confidence bound —
    // never FEWER probes than the point estimate allows
    val p90c = cal.probesFor(0.90)
    assert(p90c >= p90)
    assert(curve.find { case (_, r, se) => r - 1.645 * se >= 0.90 }
      .map(_._1).contains(p90c))
    // a 1.0 target is ALWAYS exhaustive — a sample certifies estimates,
    // never perfection (even if some ladder point measured 1.000)
    assert(cal.probesFor(1.0) == Shards)
    assert(cal.probesFor(1.0, conservative = false) == Shards)
    // an UNCALIBRATED handle is exhaustive-safe (a floor, never a budget)
    assert(index.probesFor(0.5) == Shards)
    intercept[IllegalArgumentException] { cal.probesFor(0.0) }
    intercept[IllegalArgumentException] { cal.probesFor(1.5) }
  }

  test("calibrate on a caller-supplied query sample measures THAT workload (the DSL RECALL protocol)") {
    val s = spark
    import s.implicits._
    // workload = external queries off the same manifold (never stored)
    val wdf = (0 until 32).map(i => (i.toLong, gen((5L * N + i).toLong).toSeq))
      .toDF("wid", "wv")
    val cal = index.calibrate(nQueries = 32, k = 10, seed = 3L,
      queries = Some(wdf), qVecCol = "wv")
    val curve = cal.recallCurve.toSeq
    assert(curve.nonEmpty && curve.last._1 == Shards)
    assert(curve.last._2 >= 0.90,
      f"exhaustive workload-calibrated recall ${curve.last._2}%.4f < 0.90")
    curve.sliding(2).foreach {
      case Seq((pa, a, _), (pb, b, _)) =>
        assert(b >= a - 0.05, f"recall fell $a%.4f -> $b%.4f at $pa -> $pb probes")
      case _ => ()
    }
  }

  test("calibration curve survives the artifact round trip and rides maintenance tiers") {
    val s = spark
    import s.implicits._
    // a private small index: the append tier below releases its
    // predecessor's shards, which must never be the shared fixture's
    val df = (0 until 500).map(i => (i.toLong, gen((3L * N + i).toLong).toSeq))
      .toDF("id", "key")
    val small = RoutedAnnIndex.build(df, Dim, cfg, numShards = 8, iters = 2)
    val cal = small.calibrate(nQueries = 16, k = 10, seed = 5L)
    assert(cal.recallCurve.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("routed-cal").toString
    RoutedAnnIndex.save(cal, dir, "cal-stamp")
    val loaded = RoutedAnnIndex.load(spark, dir, cfg, "cal-stamp")
    assert(loaded.isDefined)
    assert(loaded.get.recallCurve.toSeq == cal.recallCurve.toSeq,
      "curve must round-trip bit-exactly through the manifest")
    assert(loaded.get.recallK == 10, "recallK must round-trip")
    loaded.get.unpersist()
    // tombstone delete and overlay append both CARRY the curve AND its k
    // (survivor recall is delete-invariant, tails are exact)
    val afterDel = cal.delete(Seq(0L, 1L)).index
    assert(afterDel.recallCurve.toSeq == cal.recallCurve.toSeq)
    assert(afterDel.recallK == 10)
    val extra = Seq((10000L, gen((4L * N).toLong).toSeq)).toDF("id", "key")
    val appended = afterDel.append(extra)
    assert(appended.isDefined)
    assert(appended.get.recallCurve.toSeq == cal.recallCurve.toSeq)
    assert(appended.get.recallK == 10)
    appended.get.unpersist()
  }

  test("topKJoin sharp-filter auto-cutover: a known-sharp filter scans the accepted slice EXACTLY despite pruned probes; unknown cardinality rides the graphs") {
    val s = spark
    import s.implicits._
    val qdf = queries.take(20).zipWithIndex
      .map { case (v, i) => (100000L + i, v.toSeq) }.toSeq.toDF("qid", "qv")
    // sharp slice: ~2% of ids — far below FilteredScanFraction
    val picked = ids.filter(_ % 50 == 0)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(picked.length, 0.001)
    picked.foreach(bf.putLong)
    // the arm's contract is exact over the ACCEPT-FUNCTION slice, which
    // includes the sketch's (deterministic) false positives — derive the
    // truth set from the Bloom itself
    val acceptSet = ids.filter(bf.mightContainLong).toSet
    assert(acceptSet.size < RoutedAnnIndex.FilteredScanFraction * N)
    def ranked(dfr: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      dfr.select("qid", "cid", "rank").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) =>
          q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
    // KNOWN sharp cardinality at heavily PRUNED probes: the cutover
    // ignores the probe knob and scans — result is the exact filtered
    // brute force, which pruned in-graph probes could not guarantee
    val sharp = ranked(index.topKJoin(qdf, "qid", "qv", k = 5, probes = 2,
      filter = IdFilter.Bloom(bf, picked.length)))
    val fIdx = ids.indices.filter(i => acceptSet(ids(i))).toArray
    queries.take(20).zipWithIndex.foreach { case (v, i) =>
      val exp = bruteTopK(cfg.metric, fIdx.map(ids), fIdx.map(vecs), v, 5)
        .map(_._1)
      assert(sharp(100000L + i) == exp,
        s"sharp-filter scan arm diverged from the exact slice for query $i")
    }
    // UNKNOWN cardinality: the caller's probes are honored (the graph
    // arm) — results stay inside the accept slice but pruned probes may
    // miss (the measured ScaleJoin degradation, why the cutover exists)
    val unknown = ranked(index.topKJoin(qdf, "qid", "qv", k = 5, probes = 2,
      filter = IdFilter.Bloom(bf)))
    unknown.values.flatten.foreach(cid =>
      assert(acceptSet(cid), "in-graph filtered join leaked a rejected id"))
  }

  test("calibrateKs measures a serving-k LADDER in one protocol run; probesForN serves off the tightest covering curve") {
    val cal = index.calibrateKs(nQueries = 48, ks = Seq(10, 50), seed = 11L)
    assert(cal.recallCurves.map(_._1).toSeq == Seq(10, 50))
    assert(cal.recallK == 10 && cal.maxRecallK == 50)
    // the single-curve view reads the smallest-k (primary) curve
    assert(cal.recallCurve.toSeq ==
      cal.recallCurves.find(_._1 == 10).get._2.toSeq)
    // a self-sample stamps a self: workload fingerprint
    assert(cal.workloadFp.startsWith("self:"))
    // the measured k-monotonicity probesForN's covering rule rests on:
    // at fixed PRUNED probes, recall@50 <= recall@10 (+ sample noise) —
    // more of a deeper true top-k lives in unprobed shards
    val c10 = cal.recallCurves.find(_._1 == 10).get._2.map(p => p._1 -> p._2).toMap
    val c50 = cal.recallCurves.find(_._1 == 50).get._2.map(p => p._1 -> p._2).toMap
    c50.keys.filter(_ < Shards).foreach { p =>
      assert(c50(p) <= c10(p) + 0.05,
        f"recall@50 ${c50(p)}%.4f above recall@10 ${c10(p)}%.4f at probes=$p " +
          "— the covering-curve rule's monotonicity assumption broke")
    }
    // probesForN: n <= 10 reads the k=10 curve (== legacy probesFor);
    // 10 < n <= 50 reads the k=50 curve; n > 50 has no covering curve
    // and widens to exhaustive — the safe direction
    assert(cal.probesForN(0.85, 10) == cal.probesFor(0.85))
    assert(cal.probesForN(0.85, 30) == cal.probesForN(0.85, 50))
    assert(cal.probesForN(0.85, 51) == Shards)
    assert(cal.probesForN(1.0, 10) == Shards) // 1.0 stays certification
    assert(index.probesForN(0.5, 10) == Shards) // uncalibrated = exhaustive
    // the full ladder + fingerprint round-trip through the manifest
    val dir = java.nio.file.Files.createTempDirectory("routed-ks").toString
    RoutedAnnIndex.save(cal, dir, "ks-stamp")
    val loaded = RoutedAnnIndex.load(spark, dir, cfg, "ks-stamp", iters = 3)
    assert(loaded.isDefined)
    try {
      assert(loaded.get.recallCurves.map(_._1).toSeq == Seq(10, 50))
      assert(loaded.get.recallCurves.map(_._2.toSeq).toSeq ==
        cal.recallCurves.map(_._2.toSeq).toSeq,
        "curves must round-trip bit-exactly through the manifest")
      assert(loaded.get.workloadFp == cal.workloadFp,
        "workload fingerprint must round-trip")
    } finally loaded.get.unpersist()
  }

  test("routing and search are deterministic; probe ranking prefers the query's own shard") {
    val q = queries.head
    assert(index.probeShards(q, 8) == index.probeShards(q, 8))
    assert(index.search(q, K, 8) == index.search(q, K, 8))
    // a corpus vector's best shard under the routing metric is the shard
    // it was assigned to — the assignment/routing geometry is one code path
    val member = vecs(1234)
    val home = index.probeShards(member, 1).head
    val viaAssign = index.search(member, 1, 1).headOption
    assert(viaAssign.exists(_._1 == ids(1234)),
      s"corpus vector not found in its own home shard $home")
  }
}
