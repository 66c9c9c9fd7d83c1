package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

/** Hard-negative mining vs a driver-side brute-force reference. */
class NegativesSpec extends AnyFunSuite {

  // three labeled clusters on distinct axes plus cross-cluster "confusable"
  // vectors: id, vec, label
  private def vecs: Seq[(Long, Array[Float], Int)] = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
    (2L, Array(0f, 1f, 0f, 0f), 1),
    (3L, Array(0.1f, 0.9f, 0f, 0f), 1),
    (4L, Array(0.7f, 0.7f, 0f, 0f), 1), // hard negative for label 0
    (5L, Array(0f, 0f, 1f, 0f), 2),
    (6L, Array(0f, 0f, 0.9f, 0.1f), 2),
    (7L, Array(0.5f, 0f, 0.8f, 0f), 2)) // confusable with label 0 too

  private def df = {
    import spark.implicits._
    vecs.toDF("id", "vec", "label")
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("matches the brute-force reference: top-k different-label, pos anchor, semi-hard flag") {
    val k = 2
    val out = Negatives.hardNegatives(df, df,
        "id", "vec", "label", "id", "vec", "label", k)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getBoolean(5)))).toMap
    val expected = (for ((qid, qv, ql) <- vecs) yield {
      val posCos = vecs.collect { case (cid, cv, cl) if cl == ql && cid != qid => cos(qv, cv) }
        .maxOption
      val negs = vecs.collect { case (cid, cv, cl) if cl != ql => (cid, cos(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(k)
      negs.zipWithIndex.map { case ((cid, c), i) =>
        (qid, cid) -> (r4(c), posCos.map(r4).get, (i + 1).toLong,
          r4(c) < posCos.map(r4).get) }
    }).flatten.toMap
    assert(out == expected)
  }

  test("ranks are dense per query and never exceed k; self and same-label ids absent") {
    val out = Negatives.hardNegatives(df, df,
      "id", "vec", "label", "id", "vec", "label", 3).collect()
    val byQ = out.groupBy(_.getLong(0))
    val labelOf = vecs.map(v => v._1 -> v._3).toMap
    for ((qid, rows) <- byQ) {
      assert(rows.map(_.getLong(4)).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.length <= 3)
      for (r <- rows) {
        assert(r.getLong(1) != qid)
        assert(labelOf(r.getLong(1)) != labelOf(qid))
      }
    }
  }

  test("a query whose label has no other member gets NULL pos_cos and NULL semi_hard") {
    import spark.implicits._
    val lonely = (vecs :+ ((8L, Array(0f, 0f, 0f, 1f), 9)))
      .toDF("id", "vec", "label")
    val out = Negatives.hardNegatives(
        lonely.where(org.apache.spark.sql.functions.col("id") === 8L), lonely,
        "id", "vec", "label", "id", "vec", "label", 2)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.isNullAt(3) && r.isNullAt(5)))
  }

  test("k larger than the different-label population returns all of it") {
    val out = Negatives.hardNegatives(df, df,
      "id", "vec", "label", "id", "vec", "label", 100).collect()
    // query 0 (label 0): 6 rows have a different label
    assert(out.count(_.getLong(0) == 0L) == 6)
  }
}
