package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.types.{Algorithm, NonLinearConfig}

/** Filtered (in-filtering) HNSW search — transliterated from the
  * reference's adversarial suite
  * (/root/reference/ahnlich/similarity/src/tests/filtered_search.rs;
  * spec docs/specs/hnsw.md:577-649). */
class FilteredSearchSpec extends AnyFunSuite {

  private val Dim = 8

  private def build(vals: Seq[Array[Float]]): HnswIndex = {
    val idx = HnswIndex(Dim, NonLinearConfig.HNSWConfig(
      metric = Algorithm.EuclideanDistance))
    vals.zipWithIndex.foreach { case (v, i) => idx.insert(i.toLong, v) }
    idx
  }

  test("far-cluster accept list still yields n results (filtered_search.rs:35-72)") {
    // 900 vectors around the origin, 100 far away; accept ONLY the far
    // cluster. A naive top-ef-then-post-filter finds nothing; in-filtering
    // must return the 10 nearest FAR vectors.
    val near = (0 until 900).map(i => Array.fill(Dim)(i * 0.001f))
    val far = (0 until 100).map(i => Array.fill(Dim)(100.0f + i * 0.001f))
    val idx = build(near ++ far)
    val farIds = (900L until 1000L).toSet
    val accept: Long => Boolean = farIds.contains
    val results = idx.search(Array.fill(Dim)(0.0f), 10, efSearch = 16, accept)
    assert(results.size == 10,
      s"expected 10 results (100 vectors match the predicate), got ${results.size}")
    assert(results.forall(r => farIds.contains(r._1)),
      "returned a vector that does not satisfy the predicate")
  }

  test("graph-path filtering returns the nearest accepted (filtered_search.rs:80-144)") {
    val n = 8000
    val excludeNearest = 200
    val keys = (0 until n).map(i => Array.fill(Dim)(i * 0.01f))
    val idx = build(keys)
    val accept: Long => Boolean = id => id >= excludeNearest
    val results = idx.search(Array.fill(Dim)(0.0f), 10, efSearch = 16, accept)
    assert(results.size == 10, "graph path must still return the full count")
    assert(results.forall(_._1 >= excludeNearest),
      "returned one of the excluded nearest")
    // truth = indices 200..209; HNSW is approximate → require recall ≥ 8/10
    val truth = (excludeNearest.toLong until (excludeNearest + 10).toLong).toSet
    val hits = results.count(r => truth.contains(r._1))
    assert(hits >= 8, s"expected high recall of the nearest accepted, got $hits/10")
  }

  test("filtered recall across selectivities on SIFT-shaped data (hnsw.md:1026-1058)") {
    import graft.TestFixtures._
    val (ids, vecs, gen) = siftLikeDataset(seed = 31337L, n = 4000, dim = 32)
    val idx = HnswIndex(32, NonLinearConfig.HNSWConfig(
      metric = Algorithm.EuclideanDistance))
    ids.indices.foreach(i => idx.insert(ids(i), vecs(i)))
    for (modulo <- Seq(2, 10, 100)) { // 50%, 10%, 1% selectivity
      val accept: Long => Boolean = id => id % modulo == 0
      var hits = 0; var total = 0
      for (qi <- 0 until 15) {
        val q = gen((4000 + qi).toLong)
        val got = idx.search(q, 10, efSearch = 64, accept).map(_._1)
        assert(got.forall(accept))
        val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, q, 10, accept).map(_._1)
        hits += got.count(exp.toSet); total += exp.size
      }
      val recall = hits.toDouble / total
      assert(recall >= 0.8, s"selectivity 1/$modulo: recall = $recall")
    }
  }
}
