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
