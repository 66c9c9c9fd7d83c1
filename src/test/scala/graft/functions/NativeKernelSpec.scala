package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._

/** The native fused kernels must be bit-identical to the HOF reference
  * formulation (same double left-fold order) and to the JVM kernels. */
class NativeKernelSpec extends AnyFunSuite {
  import spark.implicits._

  private lazy val df = {
    val rows = (0 until 200).map { i =>
      (vec(11L, i.toLong, 32), vec(13L, i.toLong, 32))
    }
    rows.toDF("a", "b").cache()
  }

  private def collectD(c: org.apache.spark.sql.Column): Seq[Double] =
    df.select(c.cast("double").as("r")).collect().map(_.getDouble(0)).toSeq

  test("dot / cosine / sqEuclidean: native == HOF bitwise") {
    assert(collectD(Similarity.dotProduct(col("a"), col("b"))) ==
      collectD(Similarity.hof.dotProduct(col("a"), col("b"))))
    assert(collectD(Similarity.cosineSimilarity(col("a"), col("b"))) ==
      collectD(Similarity.hof.cosineSimilarity(col("a"), col("b"))))
    assert(collectD(Similarity.squaredEuclidean(col("a"), col("b"))) ==
      collectD(Similarity.hof.squaredEuclidean(col("a"), col("b"))))
    assert(collectD(Similarity.euclideanDistance(col("a"), col("b"))) ==
      collectD(Similarity.hof.euclideanDistance(col("a"), col("b"))))
  }

  test("CentroidDists: one kernel call == per-centroid sqEuclidean, bitwise") {
    import org.apache.spark.sql.graftbridge.{CentroidDists, ColumnBridge}
    val cents = Array.tabulate(17)(j => vec(99L, j.toLong, 32))
    val native = ColumnBridge.column(CentroidDists(
      ColumnBridge.expression(col("a")), cents.flatten, cents.length))
    val ref = array(cents.map(c =>
      Similarity.squaredEuclidean(col("a"), typedLit(c))): _*)
    val got = df.select(native.as("r")).collect().map(_.getSeq[Double](0)).toSeq
    val exp = df.select(ref.as("r")).collect().map(_.getSeq[Double](0)).toSeq
    assert(got == exp)
  }

  test("native kernels agree with the JVM reference kernels") {
    val rows = df.select(col("a"), col("b"),
      Similarity.dotProduct(col("a"), col("b")).as("d"),
      Similarity.cosineSimilarity(col("a"), col("b")).as("c"),
      Similarity.squaredEuclidean(col("a"), col("b")).as("s")).collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0).toArray
      val b = r.getSeq[Float](1).toArray
      assert(math.abs(r.getDouble(2) - Similarity.jvm.dot(a, b)) < 1e-12)
      assert(math.abs(r.getDouble(3) - Similarity.jvm.cosine(a, b)) < 1e-12)
      assert(math.abs(r.getDouble(4) - Similarity.jvm.sqEuclidean(a, b)) < 1e-12)
    }
  }

  test("adversarial floats: native == HOF bitwise on NaN/Inf/-0.0/denormal/overflow") {
    // bit-level compare (Seq[Double] == would fail on NaN == NaN); the
    // kernels must propagate special values exactly like the HOF fold
    val inf = Float.PositiveInfinity
    val pairs = Seq(
      (Array(Float.NaN, 1f, 2f), Array(1f, 2f, 3f)),
      (Array(inf, 1f), Array(1f, 1f)),
      (Array(-inf, inf), Array(inf, -inf)),
      (Array(-0.0f, 0.0f), Array(0.0f, -0.0f)),
      (Array(Float.MaxValue, Float.MaxValue), Array(Float.MaxValue, 1f)),
      (Array(Float.MinPositiveValue, Float.MinPositiveValue),
        Array(Float.MinPositiveValue, 1f)),
      (Array(0f, 0f), Array(0f, 0f)),
      (Array(1e30f, -1e30f, 1f), Array(1e30f, 1e30f, -1f)))
    val adv = pairs.toDF("a", "b")
    def bits(df0: org.apache.spark.sql.DataFrame)(
        c: org.apache.spark.sql.Column): Seq[Long] =
      df0.select(c.cast("double").as("r")).collect()
        .map(r => java.lang.Double.doubleToLongBits(r.getDouble(0))).toSeq
    assert(bits(adv)(Similarity.dotProduct(col("a"), col("b"))) ==
      bits(adv)(Similarity.hof.dotProduct(col("a"), col("b"))))
    assert(bits(adv)(Similarity.squaredEuclidean(col("a"), col("b"))) ==
      bits(adv)(Similarity.hof.squaredEuclidean(col("a"), col("b"))))
    assert(bits(adv)(Similarity.euclideanDistance(col("a"), col("b"))) ==
      bits(adv)(Similarity.hof.euclideanDistance(col("a"), col("b"))))
    // cosine: zero-norm rows DIVERGE by design (kernel pins the reference's
    // zero-norm -> 0.0 convention, the naive fold gives 0/0 = NaN — the
    // dedicated test below); NaN/Inf rows must still agree bit-for-bit
    val nonZeroNorm = pairs.filter { case (a, b) =>
      a.exists(_ != 0f) && b.exists(_ != 0f) }.toDF("a", "b")
    assert(bits(nonZeroNorm)(Similarity.cosineSimilarity(col("a"), col("b"))) ==
      bits(nonZeroNorm)(Similarity.hof.cosineSimilarity(col("a"), col("b"))))
  }

  test("zero-norm cosine returns 0.0 (reference convention), not NaN") {
    val z = Seq((Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    val out = z.select(Similarity.cosineSimilarity(col("a"), col("b")).as("c"))
      .head.getDouble(0)
    assert(out == 0.0)
  }

  test("SQL registration: graft_* functions callable from spark.sql") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("kernel_vecs")
    val sql = spark.sql(
      "SELECT graft_cosine(a, b) c, graft_dot(a, b) d, graft_sqeuclidean(a, b) s FROM kernel_vecs")
      .collect()
    val api = df.select(
      Similarity.cosineSimilarity(col("a"), col("b")),
      Similarity.dotProduct(col("a"), col("b")),
      Similarity.squaredEuclidean(col("a"), col("b"))).collect()
    assert(sql.map(_.getDouble(0)).toSeq == api.map(_.getDouble(0)).toSeq)
    assert(sql.map(_.getDouble(1)).toSeq == api.map(_.getDouble(1)).toSeq)
    assert(sql.map(_.getDouble(2)).toSeq == api.map(_.getDouble(2)).toSeq)
    // the SQ8 + intersect-count kernels register too
    val extra = spark.sql(
      """SELECT graft_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) i,
        |  graft_sq8_cosine(array(0L, 255L), CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
        |                   array(0L, 255L), CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) c
        |""".stripMargin).head()
    assert(extra.getLong(0) == 2L)
    assert(extra.getDouble(1) == 1.0) // identical vectors -> cosine 1
    // NFC registers too: decomposed e + U+0301 composes to é
    val nfc = spark.sql("SELECT graft_nfc('Café') n").head().getString(0)
    assert(nfc == "Café", nfc)
  }

  test("kernels run inside whole-stage codegen (plan has no fallback)") {
    // the "*(n)" prefix marks a WholeStageCodegen stage in the compact plan
    val plan = df.select(Similarity.cosineSimilarity(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_cosine("), s"no codegen span in:\n$plan")
  }

  test("byteSum: native == hex-expansion HOF, unsigned bytes, empty/null, SQL, codegen") {
    val bin = Seq(
      (1L, Array[Byte](0, 1, 2, 127)),
      (2L, Array[Byte](-1, -128)), // unsigned: 255 + 128 = 383
      (3L, Array.empty[Byte]),
      (4L, null)).toDF("id", "b")
    val hof = expr("""aggregate(
      transform(sequence(0, length(b) - 1),
        i -> conv(substr(hex(b), i*2 + 1, 2), 16, 10)),
      0L, (acc, x) -> acc + CAST(x AS LONG))""")
    val rows = bin.select(col("id"), GraftFunctions.byteSum(col("b")).as("n"), hof.as("h"))
      .orderBy("id").collect()
    assert(rows.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq ==
      Seq(130L, 383L, 0L, -1L))
    // HOF's sequence(0, -1) DESCENDS for the empty binary (env gotcha), so
    // compare only non-empty rows against it
    assert(rows.take(2).map(_.getLong(1)).toSeq == rows.take(2).map(_.getLong(2)).toSeq)
    GraftFunctions.register(spark)
    bin.createOrReplaceTempView("bytesum_t")
    assert(spark.sql("SELECT graft_byte_sum(b) FROM bytesum_t WHERE id = 2")
      .head.getLong(0) == 383L)
    // repartition blocks ConvertToLocalRelation from folding the project;
    // collect first so AQE finalizes and the codegen spans materialize
    val projected = bin.repartition(1).select(GraftFunctions.byteSum(col("b")))
    projected.collect()
    val plan = projected.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [byte_sum("), s"no codegen span in:\n$plan")
  }
}
