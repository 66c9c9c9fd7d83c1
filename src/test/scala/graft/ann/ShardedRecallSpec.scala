package graft.ann

import org.apache.spark.util.sketch.BloomFilter

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.{Algorithm, NonLinearConfig}

/**
 * Recall of the DISTRIBUTED ANN path — [[AnnIndex.build]]'s shard+merge and
 * [[AnnIndex.patch]]'s delta-rebuild — at non-degenerate shard sizes
 * (10 000 × 128-d over 16 shards ≈ 625 vectors/shard, so every per-shard
 * HNSW graph is a real small-world graph, not a complete graph).
 *
 * This is the missing half of [[RecallSpec]] (which exercises the monolithic
 * `HnswIndex` directly): the reference validates the whole index it serves
 * (similarity/src/tests/sift_dataset_validation.rs:100-113), so we must
 * validate the sharded composite users actually query, including
 *  - the merged top-k across shards at the reference threshold
 *    (Recall@50 ≥ 0.90 at M=40/M0=80/efC=100, hnsw.md:1026-1093);
 *  - recall surviving a delta-patch (mutated buckets rebuilt, others reused);
 *  - the >4096 Bloom accept-set arm with false-positive slack + exact
 *    post-verification (the [[AnnSearch]] large-filter plan).
 */
class ShardedRecallSpec extends AnyFunSuite {

  private val N = 10000
  private val Dim = 128
  private val NQueries = 100
  private val K = 50
  private val Shards = 16

  private lazy val (ids, vecs, gen) = siftLikeDataset(seed = 4242L, n = N, dim = Dim)
  private lazy val queries: Array[Array[Float]] =
    Array.tabulate(NQueries)(i => gen((N + i).toLong))

  private val cfg = NonLinearConfig.HNSWConfig(efConstruction = 100,
    maximumConnections = 40, maximumConnectionsZero = 80,
    efSearch = 16, metric = Algorithm.CosineSimilarity)

  private def toDf(ids: Array[Long], vecs: Array[Array[Float]]) = {
    val s = spark
    import s.implicits._
    ids.indices.map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
  }

  private def meanRecall(index: AnnIndex, allIds: Array[Long],
      allVecs: Array[Array[Float]]): Double = {
    val recalls = queries.map { q =>
      val got = index.search(q, K).map(_._1)
      val exp = bruteTopK(cfg.metric, allIds, allVecs, q, K).map(_._1)
      recallAtK(exp, got)
    }
    recalls.sum / recalls.length
  }

  // one sharded build shared by the three tests (built once, patched in #2)
  private lazy val index: AnnIndex =
    AnnIndex.build(toDf(ids, vecs), Dim, cfg, numShards = Some(Shards))

  test("sharded build: merged Recall@50 >= 0.90 at M=40/M0=80/efC=100 (16 shards, ~625 vectors/shard)") {
    assert(index.numShards == Shards,
      s"explicit numShards=$Shards was adjusted to ${index.numShards} — shard-size premise broken")
    val r = meanRecall(index, ids, vecs)
    info(f"sharded recall@$K = $r%.4f over $NQueries queries")
    assert(r >= 0.90, f"sharded recall@$K = $r%.4f < 0.90")
  }

  test("delta-patch: recall holds after deleting + inserting in touched buckets; deleted ids never surface") {
    // mutate buckets 3 and 7: drop every id < 2000 in them, add 200 new
    // vectors whose ids land in the same buckets (pmod(id, 16) ∈ {3, 7})
    val touched = Set(3, 7)
    val deleted = ids.filter(id => id < 2000 && touched.contains((id % Shards).toInt)).toSet
    val base = ((N + NQueries + Shards - 1) / Shards) * Shards // multiple of 16 past all live ids
    val addedIds = Array.tabulate(100)(i => (base + i * Shards + 3).toLong) ++
      Array.tabulate(100)(i => (base + i * Shards + 7).toLong)
    assert(addedIds.forall(id => touched.contains((id % Shards).toInt)))
    val addedVecs = addedIds.map(id => gen(id))

    val keepMask = ids.indices.filter(i => !deleted.contains(ids(i)))
    val newIds = keepMask.map(ids).toArray ++ addedIds
    val newVecs = keepMask.map(vecs).toArray ++ addedVecs
    val patched = AnnIndex.patch(index, toDf(newIds, newVecs), Dim, touched)
    try {
      assert(deleted.nonEmpty && addedIds.length == 200)
      val r = meanRecall(patched, newIds, newVecs)
      info(f"post-patch recall@$K = $r%.4f (deleted ${deleted.size}, added ${addedIds.length})")
      assert(r >= 0.90, f"post-patch recall@$K = $r%.4f < 0.90")
      queries.take(20).foreach { q =>
        val got = patched.search(q, K).map(_._1)
        assert(!got.exists(deleted.contains), "deleted id surfaced after patch")
      }
    } finally patched.unpersist()
  }

  test("save/load cycle: restored shards answer identically, so recall carries over") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sharded-artifacts").toString
    val stamps = (0 until Shards).map(b => b -> s"v1/_b=$b").toMap
    AnnIndex.save(index, dir, stamps)
    val loaded = AnnIndex.load(spark, dir, cfg, stamps, toDf(ids, vecs), Dim)
    assert(loaded.isDefined, "artifacts failed to load")
    try {
      // bit-identical graphs => identical merged top-k per query; recall at
      // the non-degenerate shard size therefore equals the build's (>= 0.90,
      // asserted above) — checked directly too
      queries.take(20).foreach { q =>
        assert(loaded.get.search(q, K) == index.search(q, K),
          "restored sharded index diverges from the built one")
      }
      val r = meanRecall(loaded.get, ids, vecs)
      info(f"post-restore recall@$K = $r%.4f")
      assert(r >= 0.90, f"post-restore recall@$K = $r%.4f < 0.90")
    } finally loaded.get.unpersist()
  }

  test("Bloom accept arm (>4096 ids): slack + exact post-verify reaches Recall@50 >= 0.90") {
    // accept set = even ids (5000 > BruteForceCutover) — the AnnSearch plan:
    // Bloom sketch, per-shard search with false-positive slack, exact verify
    val accept: Long => Boolean = id => (id & 1L) == 0L
    val acceptedIds = ids.filter(accept)
    assert(acceptedIds.length > AnnSearch.BruteForceCutover)
    val bloom = BloomFilter.create(acceptedIds.length.toLong, 0.001)
    acceptedIds.foreach(bloom.putLong)
    val recalls = queries.map { q =>
      val hits = index.search(q, K + AnnSearch.FalsePositiveSlack, IdFilter.Bloom(bloom))
      val got = hits.filter(h => accept(h._1)).take(K).map(_._1) // exact re-verify
      val exp = bruteTopK(cfg.metric, ids, vecs, q, K, accept).map(_._1)
      recallAtK(exp, got)
    }
    val r = recalls.sum / recalls.length
    info(f"filtered (Bloom, 5000 accepted) recall@$K = $r%.4f")
    assert(r >= 0.90, f"Bloom-filtered recall@$K = $r%.4f < 0.90")
  }
}
