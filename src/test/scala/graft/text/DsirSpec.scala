package graft.text

import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  test("importanceWeights ranks target-like docs above disjoint-vocabulary docs") {
    val target = (0L until 10L).map(i => (i, "clean well written prose here"))
      .toDF("id", "text")
    val raw = Seq(
      (1L, "clean well written prose here"),   // exactly target-like
      (2L, "clean well written junk here"),    // partially target-like
      (3L, "zz yy xx ww vv")                   // disjoint vocabulary
    ).toDF("id", "text")
    val out = Dsir.importanceWeights(raw, target, "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) > out(2L) && out(2L) > out(3L), s"got $out")
    // deterministic: recomputation is bit-identical
    val again = Dsir.importanceWeights(raw, target, "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(again == out)
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(raw, target, "id", "text", buckets = 1))
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(raw, target, "id", "text", k = 0.0))
    // an empty target raises loudly at model build, never silent NULL scores
    val e = intercept[Exception](
      Dsir.importanceWeights(raw, target.limit(0), "id", "text").collect())
    assert(e.getMessage.contains("no features") ||
      Option(e.getCause).exists(_.getMessage.contains("no features")), e.toString)
  }

  test("importanceWeights matches a driver-side reference computation") {
    // the same md5-prefix bucket math computed with plain JVM collections
    def bucket(f: String, b: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % b
    }
    def feats(t: String, b: Int): Seq[Long] = {
      val tk = t.trim.split("\\s+").toSeq
      val uni = tk
      val bi = if (tk.size >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq
               else Seq.empty
      (uni ++ bi).map(bucket(_, b))
    }
    val b = 101
    val targetDocs = Seq("a b c", "a b d")
    val rawDocs = Seq((1L, "a b c"), (2L, "x y"))
    val tc = targetDocs.flatMap(feats(_, b)).groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val rc = rawDocs.flatMap(d => feats(d._2, b)).groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val nt = tc.values.sum.toDouble; val nr = rc.values.sum.toDouble
    def score(t: String): Double = {
      val raws = feats(t, b).map { f =>
        math.log((tc.getOrElse(f, 0L) + 1.0) / (nt + b)) -
          math.log((rc(f) + 1.0) / (nr + b))
      }.sum
      BigDecimal(raws).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = Map(1L -> score("a b c"), 2L -> score("x y"))
    val out = Dsir.importanceWeights(
        rawDocs.toDF("id", "text"),
        targetDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text"),
        "id", "text", buckets = b)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == want, s"$out vs $want")
  }

  test("kernel scoring equals the shuffle formulation on a generated corpus") {
    // shipped path folds the flat log-ratio table inside NbScore (fixed
    // in-doc order); the retained join+groupBy path sums in arbitrary
    // partial-agg order — the 4-place rounding pins them equal
    val raw = spark.range(0, 300).selectExpr("id",
      """concat_ws(' ', transform(sequence(1, 2 + cast(id % 7 as int)),
         i -> concat('w', cast((id * 17 + i * 5) % 19 as string)))) as text""")
    val target = spark.range(0, 40).selectExpr("id",
      """concat_ws(' ', transform(sequence(1, 4),
         i -> concat('w', cast((id + i) % 6 as string)))) as text""")
    val a = Dsir.importanceWeights(raw, target, "id", "text", buckets = 211)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = Dsir.importanceWeightsViaShuffle(raw, target, "id", "text",
      buckets = 211)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.length == 300 && a.toSeq == b.toSeq)
  }
}
