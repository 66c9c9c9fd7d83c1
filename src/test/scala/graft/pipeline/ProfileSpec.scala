package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

class ProfileSpec extends AnyFunSuite {
  import spark.implicits._

  private def toks(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("data card counts docs, dups, empties, and histogram buckets exactly") {
    val docs = Seq(
      ("web", "en", "alpha beta gamma"),        // 3 tokens
      ("web", "en", "alpha beta gamma"),        // exact dup
      ("web", "en", ""),                        // empty
      ("web", "en", "   "),                     // whitespace-only → empty
      ("web", "de", toks(32)),                  // boundary: le_32
      ("web", "de", toks(33)),                  // boundary: le_128
      ("books", "en", toks(512)),               // boundary: le_512
      ("books", "en", toks(513)))               // boundary: gt_512
      .toDF("source", "lang", "text")
    val card = Profile.dataCard(docs, "text", Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

    val webEn = card(("web", "en"))
    assert(webEn.getAs[Long]("n_docs") == 4)
    assert(webEn.getAs[Long]("n_distinct_texts") == 3) // "", "   ", dup text
    assert(webEn.getAs[Long]("n_exact_dups") == 1)
    assert(webEn.getAs[Long]("n_empty") == 2)
    assert(webEn.getAs[Long]("total_tokens") == 6)
    assert(webEn.getAs[Long]("min_tokens") == 0)
    assert(webEn.getAs[Long]("max_tokens") == 3)
    assert(webEn.getAs[Long]("len_le_32") == 2) // the two 3-token docs

    val webDe = card(("web", "de"))
    assert(webDe.getAs[Long]("len_le_32") == 1 && webDe.getAs[Long]("len_le_128") == 1)

    val booksEn = card(("books", "en"))
    assert(booksEn.getAs[Long]("len_le_512") == 1 && booksEn.getAs[Long]("len_gt_512") == 1)
    assert(booksEn.getAs[Long]("total_tokens") == 1025)
  }

  test("embedding card: dims range, zero/non-finite counts, norm stats, dup detection") {
    val vecs = Seq(
      ("a", Array(3f, 4f)),                       // norm 5
      ("a", Array(3f, 4f)),                       // exact dup
      ("a", Array(0f, 0f)),                       // zero vector
      ("a", Array(1f, Float.NaN)),                // non-finite → excluded from norms
      ("b", Array(6f, 8f, 0f)),                   // ragged dims vs the next row
      ("b", Array(1f, 0f)))
      .toDF("grp", "vec")
    val card = Profile.embeddingCard(vecs, "vec", Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = card("a")
    assert(a.getAs[Long]("n_vecs") == 4)
    assert(a.getAs[Long]("n_distinct") == 3 && a.getAs[Long]("n_exact_dups") == 1)
    assert(a.getAs[Long]("dims_min") == 2 && a.getAs[Long]("dims_max") == 2)
    assert(a.getAs[Long]("n_zero") == 1 && a.getAs[Long]("n_nonfinite") == 1)
    // norms over the finite vectors only: {5, 5, 0} — exact ×10⁶ BIGINTs;
    // the mean ships as numerator/denominator (sum_e6 / n_finite)
    assert(a.getAs[Long]("norm_min_e6") == 0L)
    assert(a.getAs[Long]("norm_max_e6") == 5000000L)
    assert(a.getAs[Long]("norm_sum_e6") == 10000000L)
    assert(a.getAs[Long]("n_finite") == 3L)
    val b = card("b")
    assert(b.getAs[Long]("dims_min") == 2 && b.getAs[Long]("dims_max") == 3,
      "ragged dimensions must surface as a min != max range")
    assert(b.getAs[Long]("n_zero") == 0 && b.getAs[Long]("n_nonfinite") == 0)
    assert(b.getAs[Long]("norm_min_e6") == 1000000L &&
      b.getAs[Long]("norm_max_e6") == 10000000L)
  }

  test("embedding card: all-non-finite slice reports NULL norms, never a fabricated number") {
    val vecs = Seq(("x", Array(Float.NaN, 1f))).toDF("grp", "vec")
    val r = Profile.embeddingCard(vecs, "vec", Seq("grp")).collect().head
    assert(r.getAs[Long]("n_nonfinite") == 1)
    assert(r.isNullAt(r.fieldIndex("norm_min_e6")) &&
      r.isNullAt(r.fieldIndex("norm_sum_e6")))
    assert(r.getAs[Long]("n_finite") == 0L)
  }

  test("embedding card: NULL elements and NULL vectors count as non-finite, not a silent hole") {
    // exists(v, isnan || isinf) is NULL for a vector with a NULL element
    // (and for a NULL vector) — without the coalesce these rows vanished
    // from BOTH the norm stats and n_nonfinite
    val vecs = Seq(
      ("x", Array[java.lang.Float](1f, null)),
      ("x", null.asInstanceOf[Array[java.lang.Float]]),
      ("x", Array[java.lang.Float](3f, 4f)))
      .toDF("grp", "vec")
    val r = Profile.embeddingCard(vecs, "vec", Seq("grp")).collect().head
    assert(r.getAs[Long]("n_vecs") == 3L)
    assert(r.getAs[Long]("n_nonfinite") == 2L,
      "NULL-element and NULL vectors must be counted, not dropped")
    assert(r.getAs[Long]("n_finite") == 1L)
    assert(r.getAs[Long]("norm_sum_e6") == 5000000L)
  }

  test("single scan, single shuffle: the card is one partial-aggregated groupBy") {
    val docs = Seq(("a", "x y z")).toDF("source", "text")
    val p = Profile.dataCard(docs, "text", Seq("source"))
      .queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange".r.findAllIn(p).size <= 2, // agg + orderBy range
      s"data card must be one aggregation; plan:\n$p")
    assert(!p.contains("Join") && p.contains("partial"),
      s"aggregates must map-side combine; plan:\n$p")
  }
}
