package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures

class QuantizeSpec extends AnyFunSuite {
  import TestFixtures.spark.implicits._

  private def codesOf(v: Seq[Float]): Seq[Long] =
    Seq(Tuple1(v)).toDF("v").select(Quantize.int8Codes(col("v")).as("q"))
      .head.getSeq[Long](0).toSeq

  test("codes span 0..255 with min→0 and max→255") {
    val q = codesOf(Seq(-1.0f, 0.0f, 1.0f))
    assert(q == Seq(0L, 127L, 255L))
  }

  test("constant vectors quantize to all zeros (no division by zero)") {
    assert(codesOf(Seq(3.5f, 3.5f, 3.5f)) == Seq(0L, 0L, 0L))
  }

  test("codes are monotone in the input values") {
    val q = codesOf(Seq(0.1f, 0.4f, 0.2f, 0.9f, 0.0f))
    val vals = Seq(0.1f, 0.4f, 0.2f, 0.9f, 0.0f)
    for (i <- vals.indices; j <- vals.indices if vals(i) < vals(j))
      assert(q(i) <= q(j), s"code order violated at ($i,$j)")
  }

  test("dequantization error is bounded by one quantization step") {
    val (ids, vecs) = TestFixtures.dataset(seed = 42L, n = 50, dim = 64)
    val df = ids.zip(vecs).map { case (i, v) => (i, v.toSeq) }.toSeq
      .toDF("id", "v")
    val (mn, mx) = Quantize.quantParams(col("v"))
    val err = df.select(
        greatest((mx - mn) / 255.0, lit(1e-12)).as("step"),
        zip_with(transform(col("v"), _.cast("double")),
          Quantize.dequantize(Quantize.int8Codes(col("v")), mn, mx),
          (x, d) => abs(x - d)).as("errs"))
      .select(max(aggregate(col("errs"), lit(0.0),
        (acc, e) => greatest(acc, e)) / col("step")).as("worst"))
      .head.getDouble(0)
    // floor convention: |x − dequant(q(x))| < one step
    assert(err <= 1.0 + 1e-9, s"worst error $err steps")
  }

  test("matches the documented closed form on a hand case") {
    // v = [2, 6]: mn=2 mx=6 → q = floor((x−2)·255/4) → [0, 255]
    assert(codesOf(Seq(2f, 6f)) == Seq(0L, 255L))
    // v = [2, 4, 6] → middle: floor(2·255/4) = floor(127.5) = 127
    assert(codesOf(Seq(2f, 4f, 6f)) == Seq(0L, 127L, 255L))
  }

  test("fused Sq8Cosine kernel is bit-identical to the HOF dequantize-then-cosine") {
    // random vectors incl. negatives and a near-constant one; the kernel
    // must reproduce the interpreted formulation EXACTLY (same dequantize
    // op order, same left folds, same unguarded division) — it feeds the
    // coarse ranking the oracle recomputes in DuckDB
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(32)((rnd.nextFloat() * 4f - 2f))) } :+
      (200L, Seq.fill(32)(1.5f)) // mx == mn -> all-zero codes
    val df = vecs.toDF("id", "v")
    val (mn, mx) = graft.functions.Quantize.quantParams(col("v"))
    val q = df.select(col("id"),
      graft.functions.Quantize.int8Codes(col("v")).as("c"),
      mn.as("mn"), mx.as("mx"))
    val pairs = q.as("a").crossJoin(q.as("b"))
      .where(col("a.id") < col("b.id"))
    val both = pairs.select(
      graft.functions.Quantize.coarseCosine(
        col("a.c"), col("a.mn"), col("a.mx"),
        col("b.c"), col("b.mn"), col("b.mx")).as("kernel"),
      graft.functions.Similarity.hof.cosineSimilarity(
        graft.functions.Quantize.dequantize(col("a.c"), col("a.mn"), col("a.mx")),
        graft.functions.Quantize.dequantize(col("b.c"), col("b.mn"), col("b.mx")))
        .as("hof"))
      .collect()
    assert(both.length == 201 * 100)
    both.foreach { r =>
      val (k, h) = (r.getDouble(0), r.getDouble(1))
      // bit comparison: NaN == NaN here (constant vector dequantizes to a
      // nonzero constant though — NaN only if mn == 0; either way both
      // formulations must agree bitwise)
      assert(java.lang.Double.doubleToLongBits(k) ==
        java.lang.Double.doubleToLongBits(h), s"kernel $k != hof $h")
    }
  }

  test("quantized top-k with shortlist = corpus size IS the brute-force join") {
    val (ids, vecs) = TestFixtures.dataset(seed = 7L, n = 120, dim = 32)
    val df = ids.zip(vecs).map { case (i, v) => (i, v.toSeq) }.toSeq
      .toDF("id", "v")
    val q = df.where(col("id") < 6)
    val exact = graft.dedup.Dedup.topKJoin(q, df, "id", "v", "id", "v", 4)
      .select("qid", "cid", "cos", "rank").as[(Long, Long, Double, Long)]
      .collect().toSet
    val quant = Quantize.quantizedTopKJoin(q, df, "id", "v", "id", "v",
        k = 4, shortlist = 120)
      .select("qid", "cid", "cos", "rank").as[(Long, Long, Double, Long)]
      .collect().toSet
    assert(quant == exact)
  }

  test("quantized top-k at a practical shortlist keeps high recall") {
    val (ids, vecs) = TestFixtures.dataset(seed = 11L, n = 300, dim = 32)
    val df = ids.zip(vecs).map { case (i, v) => (i, v.toSeq) }.toSeq
      .toDF("id", "v")
    val q = df.where(col("id") < 10)
    def pairs(r: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      r.select("qid", "cid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val exact = pairs(graft.dedup.Dedup.topKJoin(q, df, "id", "v", "id", "v", 10))
    val quant = pairs(Quantize.quantizedTopKJoin(q, df, "id", "v", "id", "v",
      k = 10, shortlist = 80))
    val recalls = exact.map { case (qid, e) =>
      TestFixtures.recallAtK(e, quant.getOrElse(qid, Seq.empty))
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 = $mean")
  }
}
