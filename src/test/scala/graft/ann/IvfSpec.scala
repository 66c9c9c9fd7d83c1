package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.Algorithm

class IvfSpec extends AnyFunSuite {
  import spark.implicits._

  private val Dim = 16
  private lazy val (ids, vecs, gen) = siftLikeDataset(seed = 99L, n = 2000, dim = Dim)
  private lazy val df = ids.zip(vecs).toSeq
    .map { case (i, v) => (i, v) }.toDF("id", "key").cache()

  test("nProbe = nCells is exactly the linear scan") {
    val ivf = IvfIndex.build(df, nCells = 8, iters = 2)
    for (qi <- 0 until 10) {
      val q = gen((2000 + qi).toLong)
      val got = ivf.search(q, 10, nProbe = 8)
        .select("id").collect().map(_.getLong(0)).toSeq
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, q, 10).map(_._1)
      assert(got == exp, s"query $qi")
    }
    ivf.unpersist()
  }

  test("small nProbe keeps high recall on clustered data, scans fewer rows") {
    val ivf = IvfIndex.build(df, nCells = 16, iters = 3)
    var hits = 0; var total = 0
    for (qi <- 0 until 25) {
      val q = gen((3000 + qi).toLong)
      val got = ivf.search(q, 10, nProbe = 4).select("id")
        .collect().map(_.getLong(0)).toSet
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, q, 10).map(_._1)
      hits += exp.count(got.contains); total += exp.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"recall@10 with nProbe=4/16 = $recall")
    // probed fraction actually prunes: 4 of 16 cells
    val q0 = gen(3000L)
    val probed = ivf.probeCells(q0, 4)
    assert(probed.size == 4 && probed.distinct.size == 4)
    ivf.unpersist()
  }

  test("topKJoin: nProbe = nCells matches brute force; pruned probes keep recall") {
    val ivf = IvfIndex.build(df, nCells = 16, iters = 3)
    val queries = (0 until 25).map(qi => ((5000 + qi).toLong, gen((5000 + qi).toLong)))
    val qDf = queries.toDF("qid", "qv")
    // exact arm
    val exact = ivf.topKJoin(qDf, "qid", "qv", k = 10, nProbe = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq }
    queries.foreach { case (qid, qv) =>
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, qv, 10).map(_._1)
      assert(exact(qid) == exp, s"exact join mismatch for query $qid")
    }
    // pruned arm: recall over the batch
    val pruned = ivf.topKJoin(qDf, "qid", "qv", k = 10, nProbe = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    var hits = 0; var total = 0
    queries.foreach { case (qid, qv) =>
      val exp = bruteTopK(Algorithm.EuclideanDistance, ids, vecs, qv, 10).map(_._1)
      hits += exp.count(pruned.getOrElse(qid, Set.empty).contains); total += exp.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"join recall@10 with nProbe=4/16 = $recall")
    ivf.unpersist()
  }

  test("build is deterministic (same data → same centroids → same results)") {
    val a = IvfIndex.build(df, nCells = 8, iters = 2)
    val b = IvfIndex.build(df, nCells = 8, iters = 2)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
    val q = gen(5000L)
    assert(a.search(q, 5, 2).select("id").collect().toSeq ==
      b.search(q, 5, 2).select("id").collect().toSeq)
    a.unpersist(); b.unpersist()
  }
}
