package graft.text

import org.scalatest.funsuite.AnyFunSuite

class ClassifySpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps", "en"),
    (2L, "the lazy dog sleeps all day", "en"),
    (3L, "a brown dog and a quick fox", "en"),
    (4L, "der schnelle braune fuchs springt", "de"),
    (5L, "der faule hund schlaeft den ganzen tag", "de"),
    (6L, "ein brauner hund und ein schneller fuchs", "de")
  ).toDF("id", "text", "lang")

  test("predict recovers the training labels and generalizes to unseen text") {
    val model = Classify.trainNaiveBayes(train, "id", "text", "lang")
    val unseen = Seq(
      (10L, "the fox jumps over the dog"),
      (11L, "der hund springt ueber den fuchs")
    ).toDF("id", "text")
    val out = Classify.predict(model, train.select("id", "text").union(unseen),
      "id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L))
    (1L to 3L).foreach(i => assert(out(i)._1 == "en", s"doc $i: ${out(i)}"))
    (4L to 6L).foreach(i => assert(out(i)._1 == "de", s"doc $i: ${out(i)}"))
    assert(out(10L)._1 == "en" && out(11L)._1 == "de")
    // margins are positive gaps to the runner-up
    out.values.foreach { case (_, m) => assert(m > 0) }
    // deterministic: recomputation is identical
    val again = Classify.predict(model, train.select("id", "text").union(unseen),
      "id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    assert(again == out)
  }

  test("predict matches a driver-side reference computation") {
    // independent plain-JVM Naive Bayes over the same md5-bucket features
    def bucket(f: String, b: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % b
    }
    def feats(t: String, b: Int): Seq[Long] = {
      val tk = t.trim.split("\\s+").toSeq
      val bi = if (tk.size >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq
               else Seq.empty
      (tk ++ bi).map(bucket(_, b))
    }
    val b = 101
    val k = 1.0
    val rows = Seq(
      (1L, "aa bb cc", "x"), (2L, "aa bb aa", "x"),
      (3L, "dd ee ff", "y"), (4L, "ee ff dd gg", "y"))
    val byLabel = rows.groupBy(_._3)
    val counts = byLabel.map { case (l, rs) =>
      l -> rs.flatMap(r => feats(r._2, b)).groupBy(identity)
        .map { case (bk, occ) => bk -> occ.size.toLong }
    }
    val nf = byLabel.map { case (l, rs) => l -> rs.map(r => feats(r._2, b).size).sum }
    val ndoc = byLabel.map { case (l, rs) => l -> rs.size }
    val ntot = ndoc.values.sum
    def score(t: String, l: String): Double = {
      val fs = feats(t, b)
      math.log(ndoc(l).toDouble / ntot) +
        fs.map(f => math.log(counts(l).getOrElse(f, 0L) + k)).sum -
        fs.size * math.log(nf(l) + k * b)
    }
    val expected = rows.map { case (id, t, _) =>
      val scored = Seq("x", "y").map(l => (l, score(t, l)))
        .sortBy { case (l, s) => (-BigDecimal(s).setScale(6,
          BigDecimal.RoundingMode.HALF_UP), l) }
      id -> (scored.head._1,
        BigDecimal(scored.head._2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap

    val df = rows.toDF("id", "text", "lab")
    val model = Classify.trainNaiveBayes(df, "id", "text", "lab", buckets = b, k = k)
    val got = Classify.predict(model, df.select("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (l, s)) =>
      assert(got(id)._1 == l, s"doc $id label: got ${got(id)}, want ($l, $s)")
      assert(math.abs(got(id)._2 - s) < 1e-4, s"doc $id score: got ${got(id)}, want $s")
    }
  }

  test("kernel predict equals the shuffle formulation on a generated corpus") {
    // the shipped path scores inside NbScore (narrow map, fixed in-doc
    // fold order); the retained explode+broadcast-join+groupBy path sums
    // in arbitrary partial-agg order — the engine's 6/4-place rounding
    // pins them equal, which is exactly what the oracle relies on
    val docs = spark.range(0, 400).selectExpr("id",
      """concat_ws(' ', transform(sequence(1, 3 + cast(id % 9 as int)),
         i -> concat('w', cast((id * 31 + i * 7) % 23 as string)))) as text""",
      "case when id % 3 = 0 then 'a' when id % 3 = 1 then 'b' else 'c' end as lab")
    val model = Classify.trainNaiveBayes(
      docs.where("id % 2 = 0"), "id", "text", "lab", buckets = 211)
    val a = Classify.predict(model, docs.select("id", "text"), "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    val b = Classify.predictViaShuffle(model, docs.select("id", "text"),
      "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(a.length == 400 && a.toSeq == b.toSeq)
    // null text: dropped by both paths (explode emits no rows; the
    // kernel path filters)
    val withNull = Seq((1L, "aa bb"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    assert(Classify.predict(model, withNull, "id", "text")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("single-class model yields NULL margin; bad params rejected") {
    val one = Seq((1L, "aa bb", "only")).toDF("id", "text", "lab")
    val model = Classify.trainNaiveBayes(one, "id", "text", "lab", buckets = 11)
    val r = Classify.predict(model, one.select("id", "text"), "id", "text").collect()
    assert(r.length == 1 && r(0).getString(1) == "only" && r(0).isNullAt(3))
    intercept[IllegalArgumentException](
      Classify.trainNaiveBayes(one, "id", "text", "lab", buckets = 1))
    intercept[IllegalArgumentException](
      Classify.trainNaiveBayes(one, "id", "text", "lab", k = 0.0))
  }
}
