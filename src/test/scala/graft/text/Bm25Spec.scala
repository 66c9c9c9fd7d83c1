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
    // a queries frame with DUPLICATE qid rows must not double-count terms:
    // array_distinct dedups within a row only; the global (qid, ht)
    // distinct catches repeats across rows
    val dupRows = Bm25.bm25TopK(docs, "did", "text",
        Seq((10L, "apple"), (10L, "apple")).toDF("qid", "qtext"),
        "qid", "qtext", 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(dupRows == Map(1L -> 0.6463), s"got $dupRows")
    // both term-filter arms agree (broadcast vs shuffled)
    val shuffled = Bm25.bm25TopK(docs, "did", "text", queries, "qid", "qtext",
        2, broadcastQueries = false)
      .collect().map(r => ((r.getLong(0), r.getLong(3)),
        (r.getLong(1), r.getDouble(2)))).toMap
    assert(shuffled == out, s"arms disagree: $shuffled vs $out")
    intercept[IllegalArgumentException](
      Bm25.bm25TopK(docs, "did", "text", queries, "qid", "qtext", 0))
  }

  test("bm25TopK matches a driver-side reference on a random corpus") {
    import graft.TestFixtures.splitmix64
    // seeded corpus from a small vocabulary so query terms repeat across
    // docs with varying tf/dl — the statistics BM25 actually exercises
    val vocab = (0 until 30).map(i => s"w$i")
    def doc(seed: Long, len: Int): Seq[String] =
      (0 until len).map(i =>
        vocab((splitmix64(seed * 131 + i) >>> 8).toInt.abs % vocab.size))
    val docs = (0 until 60).map { d =>
      (d.toLong, doc(42L + d, 8 + (splitmix64(d.toLong) >>> 8).toInt.abs % 20))
    }
    val queries = Seq((100L, "w0 w3 w7"), (200L, "w11 w11 w25"))
    val k1 = 1.2; val b = 0.75; val k = 7
    // reference: plain-collections BM25 with the same idf/tfn and
    // rounded-score ranking contract
    val nDocs = docs.size
    val avgdl = docs.map(_._2.size).sum.toDouble / nDocs
    val df = docs.flatMap(_._2.distinct).groupBy(identity).map { case (t, v) => t -> v.size }
    def want(qterms: Seq[String]): Seq[(Long, Double)] = docs.flatMap { case (id, tk) =>
      val s = qterms.distinct.flatMap { t =>
        val tf = tk.count(_ == t)
        if (tf == 0) None else Some(
          math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5)) *
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * tk.size / avgdl)))
      }.sum
      if (s == 0.0) None
      else Some((id, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.sortBy { case (id, s) => (-s, id) }.take(k)
    import spark.implicits._
    val got = Bm25.bm25TopK(
        docs.map { case (id, tk) => (id, tk.mkString(" ")) }.toDF("did", "text"),
        "did", "text", queries.toDF("qid", "qtext"), "qid", "qtext", k)
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq }
    assert(got(100L) == want(Seq("w0", "w3", "w7")),
      s"${got(100L)} vs ${want(Seq("w0", "w3", "w7"))}")
    assert(got(200L) == want(Seq("w11", "w25")),
      s"${got(200L)} vs ${want(Seq("w11", "w25"))}")
  }
}
