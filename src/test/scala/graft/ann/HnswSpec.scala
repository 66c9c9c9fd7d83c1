package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.{Algorithm, NonLinearConfig}

/** HNSW unit behavior: high-recall on small sets, determinism, filtering
  * (reference analog: similarity/src/tests/mocked_json_tests.rs,
  * filtered_search.rs). The 10k SIFT-shaped thresholds live in RecallSpec. */
class HnswSpec extends AnyFunSuite {

  private def build(metric: Algorithm, ids: Array[Long],
      vecs: Array[Array[Float]], dim: Int,
      cfg: NonLinearConfig.HNSWConfig = NonLinearConfig.HNSWConfig()): HnswIndex = {
    val idx = HnswIndex(dim, cfg.copy(metric = metric))
    ids.indices.foreach(i => idx.insert(ids(i), vecs(i)))
    idx
  }

  test("near-exact on 1k vectors with generous ef (all metrics)") {
    val dim = 16
    val (ids, vecs) = dataset(seed = 13L, n = 1000, dim = dim)
    for (metric <- Seq(Algorithm.CosineSimilarity, Algorithm.EuclideanDistance,
        Algorithm.DotProductSimilarity)) {
      val idx = build(metric, ids, vecs, dim)
      var hits = 0; var total = 0
      for (qi <- 0 until 20) {
        val q = vec(seed = 31L, qi.toLong, dim)
        val got = idx.search(q, 10, efSearch = 100).map(_._1)
        val exp = bruteTopK(metric, ids, vecs, q, 10).map(_._1)
        hits += got.count(exp.toSet); total += exp.size
      }
      val recall = hits.toDouble / total
      assert(recall >= 0.95, s"$metric recall@10 = $recall < 0.95")
    }
  }

  test("search is deterministic across identical rebuilds") {
    val dim = 12
    val (ids, vecs) = dataset(seed = 17L, n = 500, dim = dim)
    val a = build(Algorithm.CosineSimilarity, ids, vecs, dim)
    val b = build(Algorithm.CosineSimilarity, ids, vecs, dim)
    for (qi <- 0 until 10) {
      val q = vec(seed = 41L, qi.toLong, dim)
      assert(a.search(q, 10, 32) == b.search(q, 10, 32))
    }
  }

  test("in-filtering: rejected nodes are stepping stones, results all accepted") {
    val dim = 10
    val (ids, vecs) = dataset(seed = 23L, n = 800, dim = dim)
    val idx = build(Algorithm.EuclideanDistance, ids, vecs, dim)
    val accept: Long => Boolean = id => id % 5 == 0 // 20% selectivity
    var hits = 0; var total = 0
    for (qi <- 0 until 20) {
      val q = vec(seed = 53L, qi.toLong, dim)
      val got = idx.search(q, 10, efSearch = 100, accept).map(_._1)
      assert(got.forall(accept), "returned a rejected id")
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, q, 10, accept).map(_._1)
      hits += got.count(exp.toSet); total += exp.size
    }
    assert(hits.toDouble / total >= 0.85,
      s"filtered recall = ${hits.toDouble / total}")
  }

  test("duplicate id insert is a no-op") {
    val dim = 4
    val (ids, vecs) = dataset(seed = 3L, n = 50, dim = dim)
    val idx = build(Algorithm.CosineSimilarity, ids, vecs, dim)
    assert(idx.size == 50)
    idx.insert(7L, vecs(7))
    assert(idx.size == 50)
  }

  test("empty index returns no results") {
    val idx = HnswIndex(4, NonLinearConfig.HNSWConfig())
    assert(idx.search(Array(1f, 2f, 3f, 4f), 5, 16).isEmpty)
  }

  test("acceptedEntries == entries filtered on id, under f32 and sq8 storage") {
    // the slice-scan extraction seam (round-17 r16-advice fix): the id is
    // tested BEFORE the stored vector materializes — semantics must be
    // exactly entries-then-filter, for every storage kind
    val dim = 8
    val (ids, vecs) = dataset(seed = 91L, n = 300, dim = dim)
    for (storage <- Seq(NodeStorage.F32, NodeStorage.Sq8)) {
      val idx = HnswIndex(dim, NonLinearConfig.HNSWConfig(), storage)
      ids.indices.foreach(i => idx.insert(ids(i), vecs(i)))
      val accept: Long => Boolean = id => id % 3 == 0
      val got = idx.acceptedEntries(accept).toSeq
      val exp = idx.entries.filter { case (id, _) => accept(id) }.toSeq
      assert(got.map(_._1) === exp.map(_._1))
      got.zip(exp).foreach { case ((_, gv), (_, ev)) =>
        assert(gv.sameElements(ev)) }
      // null accept = identity with entries
      assert(idx.acceptedEntries(null).map(_._1).toSeq ===
        idx.entries.map(_._1).toSeq)
    }
  }
}
