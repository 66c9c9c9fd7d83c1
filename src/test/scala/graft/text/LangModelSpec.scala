package graft.text

import org.scalatest.funsuite.AnyFunSuite

class LangModelSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  test("bigramPerplexity: hand-computed add-1 model on a 3-doc corpus") {
    // corpus bigrams: doc1 "x y x y" → (x,y),(y,x),(x,y); doc2 "x z" → (x,z)
    // counts: c(x,y)=2 c(y,x)=1 c(x,z)=1; contexts: c(x·)=3 c(y·)=1
    // V = |{x,y,z,solo}| = 4 (doc3 contributes vocabulary, no bigrams)
    // P(y|x)=(2+1)/(3+4)=3/7  P(x|y)=(1+1)/(1+4)=2/5  P(z|x)=(1+1)/(3+4)=2/7
    // doc1 ppl = ((7/3)^2 * 5/2)^(1/3) = 2.3876...; doc2 ppl = 7/2 = 3.5
    val docs = Seq(
      (1L, "x y x y"),
      (2L, "x z"),
      (3L, "solo")).toDF("id", "text")
    val out = LangModel.bigramPerplexity(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == Map(1L -> 2.3876, 2L -> 3.5), s"got $out")
    // fewer than two tokens → no bigrams → absent (documented contract)
    assert(!out.contains(3L))
    intercept[IllegalArgumentException](
      LangModel.bigramPerplexity(docs, "id", "text", k = 0.0))
  }

  test("train/score: out-of-domain bigrams price at k/(kV), self-score matches") {
    // model trained on "x y x y": V = {x,y} = 2
    // scoring "q r": bigram and context both unseen → P = 1/(0 + 1·2) = 1/2
    // → ppl = 2.0 = V (the canonical unseen-text ceiling for add-1)
    val ref = Seq((1L, "x y x y")).toDF("id", "text")
    val model = LangModel.train(ref, "id", "text")
    val out = LangModel.score(model, Seq((9L, "q r")).toDF("id", "text"),
        "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == Map(9L -> 2.0), s"got $out")
    // self-scoring through train+score equals the one-corpus formulation
    val docs = Seq((1L, "x y x y"), (2L, "x z")).toDF("id", "text")
    val self = LangModel.score(LangModel.train(docs, "id", "text"), docs,
      "id", "text").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val one = LangModel.bigramPerplexity(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(self == one, s"$self vs $one")
  }

  test("pplBuckets: sample cutoffs split head/middle/tail; order respects ppl") {
    // 30 docs across three clear perplexity strata (conforming, mildly
    // noisy, scrambled) — sampleFraction 1.0 makes the tertiles exact
    val sent = "the quick brown fox jumps over the lazy dog"
    val docs = (
      (0L until 10L).map(i => (i, sent)) ++
      (10L until 20L).map(i => (i, sent + " entropy token" + (i % 3))) ++
      (20L until 30L).map(i => (i, s"dog brown lazy the fox quick jumps $i over"))
    ).toDF("id", "text")
    val scored = LangModel.bigramPerplexity(docs, "id", "text")
    val out = LangModel.pplBuckets(scored, "id", "ppl", sampleFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.length == 30)
    // buckets are monotone in ppl: no head doc scores above any tail doc
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // full-sample tertiles: 10 docs each
    assert(byBucket.view.mapValues(_.length).toMap ==
      Map("head" -> 10, "middle" -> 10, "tail" -> 10))
    // determinism: same input, same buckets
    val again = LangModel.pplBuckets(scored, "id", "ppl", sampleFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out.map(t => t._1 -> t._3).toMap == again)
    // degenerate: a 1-row sample buckets everything at/below its cut as
    // head, the rest tail (middle collapses) — deterministic, no throw
    val one = LangModel.pplBuckets(scored.where($"id" === 0L), "id", "ppl",
      sampleFraction = 1.0).collect()
    assert(one.forall(_.getString(2) == "head"))
    // empty scored frame fails loudly
    intercept[IllegalArgumentException] {
      LangModel.pplBuckets(scored.where($"id" < 0L), "id", "ppl", 1.0)
    }
  }

  test("bigramPerplexity separates natural text from shuffled-token noise") {
    // a corpus dominated by one repeated sentence gives LOW perplexity to
    // conforming docs and HIGH perplexity to a doc of rare transitions
    val sent = "the quick brown fox jumps over the lazy dog"
    val docs = ((0L until 20L).map(i => (i, sent)) :+
      (99L, "dog brown lazy the fox quick jumps dog over")).toDF("id", "text")
    val out = LangModel.bigramPerplexity(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val conforming = out(0L)
    assert((0L until 20L).forall(i => out(i) == conforming))
    assert(out(99L) > 2 * conforming,
      s"noise doc ${out(99L)} should be far above conforming $conforming")
  }

  test("kernel scoring arm equals the join formulation, including the fallback") {
    import org.apache.spark.sql.functions._
    val ref = spark.range(0, 150).selectExpr("id",
      """concat_ws(' ', transform(sequence(1, 4 + cast(id % 9 as int)),
         i -> concat('w', cast((id * 13 + i * 3) % 17 as string)))) as text""")
    val docs = spark.range(0, 200).selectExpr("id",
      """concat_ws(' ', transform(sequence(1, 1 + cast(id % 8 as int)),
         i -> concat('w', cast((id * 7 + i * 11) % 23 as string)))) as text""")
      .union(Seq((901L, "solo"), (902L, null.asInstanceOf[String]),
        (903L, "w1 w1 w1 unseen")).toDF("id", "text"))
    val model = LangModel.train(ref, "id", "text")
    val kern = LangModel.score(model, docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    // the arm memoized as Some(broadcast) — the kernel path really ran
    assert(model.kernelArm.exists(_.isDefined))
    val join = LangModel.scoreViaJoin(model, docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(kern.toSeq == join.toSeq)
    // single-token and null-text docs absent from both outputs
    assert(!kern.exists(r => r._1 == 901L || r._1 == 902L))
    assert(kern.exists(_._1 == 903L))
    // a fresh model forced past the collect bound takes the join arm and
    // produces the identical frame
    val big = LangModel.train(ref, "id", "text")
    val fb = LangModel.score(big, docs, "id", "text", maxCollectBigrams = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(big.kernelArm.contains(None) && fb.toSeq == kern.toSeq)
  }
}
