package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

class HeavyHittersSpec extends AnyFunSuite {
  import spark.implicits._

  private val corpus = Seq(
    "the quick fox jumps over the quick fox",
    "the quick fox sleeps",
    "over the lazy dog the quick brown fox",
    "a b a b a b",
    "short"
  ).toDF("text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("ngram", "n", "rank").as[(String, Long, Long)]
      .collect().sortBy(_._3).toSeq

  test("hash-first arm equals the exact string-count arm") {
    for (k <- Seq(1, 3, 5, 100); n <- Seq(1, 2, 3)) {
      val fast = rows(HeavyHitters.ngramTopK(corpus, "text", n, k))
      val exact = rows(HeavyHitters.ngramTopKExact(corpus, "text", n, k))
      assert(fast == exact, s"arms diverge at n=$n k=$k")
    }
  }

  test("ranks by count desc then gram asc, and keeps kth-count ties exact") {
    val got = rows(HeavyHitters.ngramTopK(corpus, "text", n = 2, k = 3))
    // bigram counts: "the quick"=4, "quick fox"=3, "a b"=3, "b a"=2, ...
    assert(got == Seq(
      ("the quick", 4L, 1L),
      ("a b", 3L, 2L),      // ties with "quick fox": gram ASC decides
      ("quick fox", 3L, 3L)))
  }

  test("k beyond the distinct-gram count returns every gram") {
    val got = rows(HeavyHitters.ngramTopK(corpus, "text", n = 3, k = 1000))
    val want = rows(HeavyHitters.ngramTopKExact(corpus, "text", 3, 1000))
    assert(got == want && got.nonEmpty)
    assert(got.map(_._3) == (1L to got.length.toLong))
  }

  test("texts shorter than n contribute nothing; empty corpus yields empty") {
    val tiny = Seq("one two").toDF("text")
    assert(rows(HeavyHitters.ngramTopK(tiny, "text", n = 5, k = 10)).isEmpty)
    val empty = spark.emptyDataset[String].toDF("text")
    assert(rows(HeavyHitters.ngramTopK(empty, "text", n = 2, k = 10)).isEmpty)
  }

  test("degenerate tie storms fail loudly instead of an unbounded resolve set") {
    // 50 distinct unigrams all with count 1 and k=1 → 50 grams tie at the
    // kth count; maxCandidates=10 must refuse
    val flat = (1 to 50).map(i => s"w$i").toDF("text")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.ngramTopK(flat, "text", n = 1, k = 1, maxCandidates = 10)
        .collect()
    }
    assert(e.getMessage.contains("maxCandidates"))
  }
}
