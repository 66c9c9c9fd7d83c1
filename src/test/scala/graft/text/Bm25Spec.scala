package graft.text

import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  test("bm25TopK: hand-computed Lucene-variant scores, rounded-score ranking") {
    // N=3, avgdl=3; dfs: apple=2 banana=1 cherry=1 durian=1
    // idf(apple)=ln(1.6); q1 "apple":
    //   d1 tf=2 dl=3: tfn=4.4/3.2=1.375      → 0.470004·1.375    = 0.6463
    //   d2 tf=1 dl=2: tfn=2.2/1.9=1.15789…   → 0.470004·1.15789… = 0.5442
    // q2 "banana durian": idf=ln(8/3)=0.980829
    //   d3 durian tf=4 dl=4: tfn=8.8/5.5=1.6 → 1.5693 (rank 1)
    //   d1 banana tf=1 dl=3: tfn=2.2/2.2=1.0 → 0.9808 (rank 2)
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian durian durian")).toDF("did", "text")
    val queries = Seq((10L, "apple"), (20L, "banana durian"))
      .toDF("qid", "qtext")
    val out = Bm25.bm25TopK(docs, "did", "text", queries, "qid", "qtext", 2)
      .collect().map(r => ((r.getLong(0), r.getLong(3)),
        (r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(
      (10L, 1L) -> (1L, 0.6463),
      (10L, 2L) -> (2L, 0.5442),
      (20L, 1L) -> (3L, 1.5693),
      (20L, 2L) -> (1L, 0.9808)), s"got $out")
    // duplicated query terms do not double-count (distinct term set)
    val dup = Bm25.bm25TopK(docs, "did", "text",
        Seq((10L, "apple apple")).toDF("qid", "qtext"), "qid", "qtext", 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(dup == Map(1L -> 0.6463), s"got $dup")
    intercept[IllegalArgumentException](
      Bm25.bm25TopK(docs, "did", "text", queries, "qid", "qtext", 0))
  }
}
