package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

/** Cross-source overlap matrix vs a driver-side string reference. */
class OverlapSpec extends AnyFunSuite {

  private def docs: Seq[(Long, String, String)] = Seq(
    (0L, "a", "the quick brown fox jumps over the lazy dog"),
    (1L, "a", "spark catalyst rules rewrite the plan"),
    (2L, "b", "the quick brown fox jumps over the lazy dog"), // = doc 0
    (3L, "b", "fresh unrelated content entirely its own words"),
    (4L, "c", "no shared grams here at all"),
    (5L, "c", "spark catalyst rules rewrite the plan"), // = doc 1
    (6L, "d", "xx")) // too short for a 2-gram: d has zero grams

  private def df = {
    import spark.implicits._
    docs.toDF("doc_id", "source", "text")
  }

  private def grams(text: String, n: Int): Set[String] = {
    val t = text.trim.split("\\s+").toSeq
    if (t.length < n) Set.empty
    else t.sliding(n).map(_.mkString(" ")).toSet
  }

  private def r4(x: Double) =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("matches the driver string reference on every pair, zero-overlap pairs included") {
    val n = 2
    val byGroup = docs.groupBy(_._2).map { case (g, ds) =>
      g -> ds.map(d => grams(d._3, n)).reduce(_ ++ _) }
    val groups = byGroup.keys.toSeq.sorted
    val expected = (for {
      i <- groups.indices; j <- (i + 1) until groups.length
      a = groups(i); b = groups(j)
      sa = byGroup(a); sb = byGroup(b)
      inter = (sa & sb).size
    } yield (a, b) -> (sa.size.toLong, sb.size.toLong, inter.toLong,
      if (sa.nonEmpty || sb.nonEmpty)
        r4(inter.toDouble / (sa.size + sb.size - inter)) else 0.0,
      if (sa.nonEmpty) r4(inter.toDouble / sa.size) else 0.0,
      if (sb.nonEmpty) r4(inter.toDouble / sb.size) else 0.0)).toMap
    val out = Overlap.overlapMatrix(df, "source", "text", n)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(out == expected)
    // the matrix is complete: all G(G-1)/2 pairs present, incl. d's zeros
    assert(out.size == groups.length * (groups.length - 1) / 2)
    // the planted identical docs drive real intersections
    assert(out(("a", "b"))._3 > 0 && out(("a", "c"))._3 > 0)
    // c and b share nothing
    assert(out(("b", "c"))._3 == 0L && out(("b", "c"))._4 == 0.0)
  }

  test("containment is asymmetric: a small source inside a big one") {
    import spark.implicits._
    val d = Seq(
      (0L, "big", "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "big", "iota kappa lambda mu nu xi omicron pi"),
      (2L, "small", "alpha beta gamma delta")).toDF("doc_id", "source", "text")
    val row = Overlap.overlapMatrix(d, "source", "text", 2)
      .collect().head
    // small's 3 grams are all inside big → containment_small = 1.0
    assert(row.getString(0) == "big" && row.getString(1) == "small")
    assert(row.getDouble(7) == 1.0)
    assert(row.getDouble(6) < 0.5) // big is far from contained in small
  }

  test("tokenDrift matches a driver reference; identical slices drift 0, disjoint drift 2") {
    import spark.implicits._
    val d = Seq(
      (0L, "a", "x x y z"), (1L, "b", "x x y z"),   // b identical to a
      (2L, "c", "x y y q"),                          // partial overlap
      (3L, "d", "p p r s"))                          // disjoint from a
      .toDF("doc_id", "source", "text")
    val out = Overlap.tokenDrift(d, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6))).toMap
    // driver reference
    def dist(ts: Seq[String]): Map[String, Double] = {
      val c = ts.groupBy(identity).map { case (t, o) => t -> o.size.toDouble }
      c.map { case (t, n) => t -> n / ts.size }
    }
    val corpora = Map(
      "a" -> "x x y z", "b" -> "x x y z", "c" -> "x y y q", "d" -> "p p r s")
      .map { case (g, t) => g -> t.split("\\s+").toSeq }
    def l1(a: String, b: String): Double = {
      val (pa, pb) = (dist(corpora(a)), dist(corpora(b)))
      (pa.keySet ++ pb.keySet).toSeq
        .map(t => math.abs(pa.getOrElse(t, 0.0) - pb.getOrElse(t, 0.0))).sum
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (((a, b), (_, _, _, _, got)) <- out)
      assert(math.abs(got - r4(l1(a, b))) < 2e-4, s"l1($a,$b): $got vs ${l1(a, b)}")
    assert(out(("a", "b"))._5 == 0.0)                   // identical
    assert(out(("a", "d"))._5 == 2.0)                   // disjoint
    assert(out(("a", "d"))._3 == 0L)                    // no shared vocab
    assert(out(("a", "b"))._4 == 1.0)                   // vocab jaccard 1
    assert(out.size == 6)                               // full 4C2 matrix
  }

  test("NgramHashCounts pre-aggregation is count-pinned to the occurrence explode") {
    // the tokenDrift rework: per-doc RLE (hash, count) pairs summed per
    // (g, h) must equal counting raw occurrence rows — over docs with
    // heavy in-doc repetition, unicode tokens, single tokens, and the
    // multi-gram (n=3) path the drift op doesn't use
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.{ColumnBridge, NgramHash, NgramHashCounts}
    import spark.implicits._
    val rep = (0 until 60).map { i =>
      (i.toLong, (0 to i % 7).map(j =>
        Seq("the", "the", "wörd", "a", "b", "the the", "-")(
          (i + j) % 7)).mkString(" "))
    }.toDF("id", "text")
    for (n <- Seq(1, 3)) {
      val toks = graft.text.TextOps.tokens(col("text"))
      val viaCounts = rep.select(explode(ColumnBridge.column(
          NgramHashCounts(ColumnBridge.expression(toks), n))).as("p"))
        .groupBy(col("p.h").as("h")).agg(sum(col("p.c")).as("c"))
      val viaOcc = rep.select(explode(ColumnBridge.column(
          NgramHash(ColumnBridge.expression(toks), n))).as("h"))
        .groupBy("h").agg(count(lit(1)).as("c"))
      val a = viaCounts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = viaOcc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a == b, s"n=$n: RLE sums diverge from occurrence counts")
      assert(a.values.exists(_ > 1), s"n=$n: sweep never produced a repeat")
    }
  }

  test("corpusDiff labels added/removed/changed, omits unchanged, refuses dup ids") {
    import spark.implicits._
    val old = Seq((0L, "same"), (1L, "will change"), (2L, "will vanish"))
      .toDF("doc_id", "text")
    val neu = Seq((0L, "same"), (1L, "changed!"), (3L, "brand new"))
      .toDF("doc_id", "text")
    val got = Overlap.corpusDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "removed", 3L -> "added"))
    // duplicate ids fail loudly (raise_error in the same pass)
    val dup = Seq((0L, "a"), (0L, "b")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Overlap.corpusDiff(dup, neu, "doc_id", "text").collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("duplicate"))
  }

  test("NULL sources are excluded; single-group corpus yields an empty matrix") {
    import spark.implicits._
    val d = Seq((0L, Some("a"), "x y z"), (1L, None, "x y z"))
      .toDF("doc_id", "source", "text")
    assert(Overlap.overlapMatrix(d, "source", "text", 2).count() == 0)
  }
}
