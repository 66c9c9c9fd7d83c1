package graft.text

import org.scalatest.funsuite.AnyFunSuite

class HybridSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  test("rrfFuse: hand-computed fusion, absence contributes zero") {
    // q1: list A ranks d1=1 d2=2; list B ranks d2=1 d3=2 (c = 60)
    //  d2 = 1/62 + 1/61 = 0.016129… + 0.016393… = 0.032522 → rank 1
    //  d1 = 1/61 = 0.016393 → rank 2
    //  d3 = 1/62 = 0.016129 → rank 3
    val a = Seq((1L, 1L, 1L), (1L, 2L, 2L)).toDF("qid", "did", "rank")
    val b = Seq((1L, 2L, 1L), (1L, 3L, 2L)).toDF("qid", "did", "rank")
    val out = Hybrid.rrfFuse(a, b, k = 3)
      .collect().map(r => (r.getLong(3), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out == Map(
      1L -> (2L, 0.032522),
      2L -> (1L, 0.016393),
      3L -> (3L, 0.016129)), s"got $out")
    // k truncates on the fused order
    assert(Hybrid.rrfFuse(a, b, k = 1).count() == 1)
    intercept[IllegalArgumentException](Hybrid.rrfFuse(a, b, 0))
  }
}
