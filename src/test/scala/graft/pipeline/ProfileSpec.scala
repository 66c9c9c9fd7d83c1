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
