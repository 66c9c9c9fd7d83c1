package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.Algorithm

/** KD-tree vs brute force (reference analog:
  * similarity/src/tests/mocked_json_tests.rs + kdtree.rs test mod). */
class KdTreeSpec extends AnyFunSuite {

  private def buildTree(ids: Array[Long], vecs: Array[Array[Float]], dim: Int): KdTree = {
    val t = new KdTree(dim)
    t.build(ids, vecs)
    t
  }

  test("exact n-nearest matches brute force on 1k vectors, many queries") {
    val dim = 8
    val (ids, vecs) = dataset(seed = 7L, n = 1000, dim = dim)
    val tree = buildTree(ids, vecs, dim)
    for (qi <- 0 until 50) {
      val q = vec(seed = 99L, qi.toLong, dim)
      val got = tree.nNearest(q, 10)
      val exp = bruteTopK(Algorithm.KDTree, ids, vecs, q, 10)
        .map { case (id, c) => (id, -c) } // KDTree reports squared distance
      assert(got.map(_._1) == exp.map(_._1), s"query $qi ids mismatch")
      got.zip(exp).foreach { case ((_, d1), (_, d2)) =>
        assert(math.abs(d1 - d2) < 1e-9)
      }
    }
  }

  test("accept-list filtered search stays exact") {
    val dim = 6
    val (ids, vecs) = dataset(seed = 21L, n = 500, dim = dim)
    val tree = buildTree(ids, vecs, dim)
    val accept: Long => Boolean = id => id % 3 == 0
    for (qi <- 0 until 20) {
      val q = vec(seed = 5L, qi.toLong, dim)
      val got = tree.nNearest(q, 7, accept)
      val exp = bruteTopK(Algorithm.KDTree, ids, vecs, q, 7, accept)
        .map { case (id, c) => (id, -c) }
      assert(got.map(_._1) == exp.map(_._1), s"query $qi ids mismatch")
    }
  }

  test("equal-distance ties keep the SMALLEST ids (deterministic tie-break)") {
    // ids 1,3,5 share one vector; n=2 must return {1,3}, never {1,5}
    val v = Array(1.0f, 1.0f)
    val far = Array(9.0f, 9.0f)
    val tree = buildTree(Array(5L, 3L, 1L, 8L), Array(v, v, v, far), 2)
    val got = tree.nNearest(Array(1.0f, 1.0f), 2)
    assert(got.map(_._1) == Seq(1L, 3L))
    // and with n=3 the full tie set in id order
    assert(tree.nNearest(Array(1.0f, 1.0f), 3).map(_._1) == Seq(1L, 3L, 5L))
  }

  test("duplicate content-ids are deduped at build") {
    val (ids, vecs) = dataset(seed = 3L, n = 100, dim = 4)
    val dupIds = ids ++ ids
    val dupVecs = vecs ++ vecs
    val tree = new KdTree(4)
    tree.build(dupIds, dupVecs)
    assert(tree.size == 100)
  }

  test("n larger than population returns everything, ascending distance") {
    val (ids, vecs) = dataset(seed = 11L, n = 20, dim = 3)
    val tree = buildTree(ids, vecs, 3)
    val q = vec(77L, 0L, 3)
    val got = tree.nNearest(q, 50)
    assert(got.size == 20)
    assert(got.map(_._2) == got.map(_._2).sorted)
  }
}
