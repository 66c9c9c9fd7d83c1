package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * BPE trainer + encode kernel, pinned three ways:
 *  - hand-computed merges/encodings on corpora small enough to verify on
 *    paper (including the overlapping-run case that distinguishes one
 *    greedy pass from naive find-and-replace-all);
 *  - ARM AGREEMENT: the distributed trainer must equal the driver arm
 *    (which is BpeReference) on the same corpus — the size-adaptive
 *    dispatch can never change results;
 *  - DIFFERENTIAL: on a seeded random corpus, distributed train and the
 *    codegen'd encode expression must exactly match the independent
 *    single-node reference (the BM25/spans idiom).
 */
class BpeSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  test("hand-computed: pair counting, tie-break, minPairCount stop") {
    // pre-tokens: "aa":2 (line heads), " ab":1, " aa":1
    // pairs: (a,a) = 2 ("aa") + 1 (" aa") = 3; ( ,a) = 2; (a,b) = 1
    // round 1: best (a,a) c=3 → merge "aa"
    // round 2: ( ,aa):1, ( ,a):1, (a,b):1 — all below minPairCount=2 → stop
    val merges = BpeReference.train(Seq("aa ab", "aa aa"), 8)
    assert(merges == Seq(("a", "a")), s"got $merges")
    assert(BpeReference.encode("aa ab", merges).toSeq ==
      Seq("aa", " ", "a", "b"))
  }

  test("hand-computed: overlapping run is ONE greedy pass per merge") {
    // "aaa":1, " aaaa":1 → (a,a) count = 2 + 3 = 5 → merge 1 = (a,a)
    // after: [aa,a] and [' ',aa,aa] → every pair count 1 → stop
    val merges = BpeReference.train(Seq("aaa aaaa"), 8)
    assert(merges == Seq(("a", "a")), s"got $merges")
    // encode replays: "aaaa" → [aa, aa] (greedy pairs), "aaa" → [aa, a]
    assert(BpeReference.encode("aaa", merges).toSeq == Seq("aa", "a"))
    assert(BpeReference.encode("aaaa", merges).toSeq == Seq("aa", "aa"))
    assert(BpeReference.encode("aaaaa", merges).toSeq == Seq("aa", "aa", "a"))
  }

  test("hand-computed: multi-level merges and digit/punct symbol classes") {
    // corpus rigged so merges stack: t+h, th+e
    val corpus = Seq.fill(4)("the then they") ++ Seq("x1 23! the?")
    // round 1: (t,h) and (h,e) both count 13 — the lexicographic
    // tie-break (l asc) picks (h,e); round 2: (t,he) = 13 → "the"
    val merges = BpeReference.train(corpus, 2)
    assert(merges == Seq(("h", "e"), ("t", "he")), s"got $merges")
    val enc = BpeReference.encode("the x1 23! they", merges)
    // "the"→[the]; " x1" pre-tokenizes as " x"+"1" (letters and digits
    // are separate runs); " they"→[' ', the, y]
    assert(enc.mkString("|") == "the| |x|1| |2|3|!| |the|y",
      s"got ${enc.mkString("|")}")
  }

  test("distributed trainer equals the driver arm (and the reference) on the demo-scale corpus") {
    val corpus = graft.queries.Queries.BpeDemoCorpus
    val df = spark.sparkContext.parallelize(corpus, 4).toDF("text")
    val ref = BpeReference.train(corpus, 20)
    val dist = Bpe.train(df, "text", 20, forceDistributed = true).merges
    val driver = Bpe.train(df, "text", 20).merges
    assert(dist == ref, s"distributed arm diverged:\n  dist=$dist\n  ref =$ref")
    assert(driver == ref)
  }

  test("differential: seeded random corpus — distributed train + codegen encode match the reference") {
    import graft.TestFixtures.splitmix64
    val vocab = Vector("ab", "abc", "bca", "ca", "a", "b", "c", "cab",
      "aa", "bb", "x9", "9x", "!", "?!", "zq")
    val docs = (0 until 120).map { i =>
      val n = 3 + math.floorMod(splitmix64(i * 7 + 1), 9).toInt
      val words = (0 until n).map(j =>
        vocab(math.floorMod(splitmix64(i * 131 + j), vocab.length).toInt))
      (i.toLong, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val ref = BpeReference.train(docs.map(_._2), 24)
    val dist = Bpe.train(df, "text", 24, forceDistributed = true).merges
    assert(dist == ref, s"train diverged:\n  dist=$dist\n  ref =$ref")

    val model = Bpe.Model(ref)
    val got = df.select(col("doc_id"), Bpe.encode(col("text"), model).as("tk"),
        Bpe.tokenCount(col("text"), model).as("n"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toVector, r.getInt(2)))
      .sortBy(_._1)
    docs.foreach { case (id, text) =>
      val want = BpeReference.encode(text, ref)
      val (_, tk, n) = got(id.toInt)
      assert(tk == want, s"encode diverged on doc $id ('$text'): $tk vs $want")
      assert(n == want.length)
    }
  }

  test("packSequences/chunkByTokens route over BPE token ids") {
    val corpus = Seq((0L, "the fast scan"), (1L, "aaa aaaa the table"),
      (2L, ""), (3L, "merge the runs"))
    val df = corpus.toDF("doc_id", "text")
    val model = Bpe.Model(BpeReference.train(
      graft.queries.Queries.BpeDemoCorpus, 32))
    val packed = graft.pipeline.Corpus.packSequences(
        df, "doc_id", "text", budget = 8, shards = 1, bpe = Some(model))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    corpus.foreach { case (id, text) =>
      assert(packed(id) == BpeReference.encode(text, model.merges).length,
        s"n_tok mismatch on doc $id")
    }
    // chunking with zero overlap partitions the token sequence exactly:
    // re-joining the chunks reconstructs the full encoded text
    val chunks = graft.pipeline.Corpus.chunkByTokens(
        df, "doc_id", "text", chunkSize = 4, overlap = 0, bpe = Some(model))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    corpus.foreach { case (id, text) =>
      val mine = chunks.filter(_._1 == id).sortBy(_._2)
      val want = BpeReference.encode(text, model.merges)
      assert(mine.map(_._3).mkString("") == want.mkString(""),
        s"chunk reconstruction failed on doc $id")
      assert(mine.map(_._4).sum == want.length)
    }
  }
}
