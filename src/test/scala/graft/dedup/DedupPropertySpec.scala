package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.{spark, splitmix64}

/**
 * Randomized differential properties of the near-dup family on a SEEDED
 * synthetic corpus (deterministic — no flaky randomness): the fixed oracle
 * corpus pins exact values, these pin the STRUCTURAL contracts on corpora
 * the oracle never saw:
 *  - MinHash-LSH == exact Jaccard (the banding miss probability at 16
 *    single-hash bands is ≈ (1−J)^16 ≤ 6.5e-5 per qualifying pair);
 *  - SimHash ⊆ exact (verification is exact, so no false pair can appear;
 *    banding may miss — subset, not equality);
 *  - capped ⊆ exact, and == exact when every qualifying pair shares a
 *    below-cap shingle;
 *  - every reported jac value is ≥ the threshold.
 */
class DedupPropertySpec extends AnyFunSuite {

  /** Corpus: base docs from a small token pool, plus mutated near-copies
    * (drop/replace a few tokens) and exact copies — the shapes dedup must
    * catch, with enough shared vocabulary to stress banding. */
  private def corpus(seed: Long, nBase: Int): Seq[(Long, String)] = {
    val vocab = (0 until 200).map(i => s"tok$i")
    def tokens(docSeed: Long, len: Int): Seq[String] =
      (0 until len).map(i => vocab((splitmix64(docSeed * 31 + i) >>> 8).toInt.abs % vocab.size))
    val base = (0 until nBase).map { d =>
      val len = 12 + (splitmix64(seed + d) >>> 8).toInt.abs % 20
      (d.toLong, tokens(seed * 1000 + d, len))
    }
    val variants = base.filter(_._1 % 3 == 0).map { case (id, toks) =>
      // near-copy: replace one token near the end
      val idx = toks.size - 2 - (splitmix64(seed ^ id) >>> 8).toInt.abs % 3
      val repl = vocab((splitmix64(seed * 7 + id) >>> 8).toInt.abs % vocab.size)
      (id + 10000, toks.updated(math.max(idx, 0), repl))
    }
    val copies = base.filter(_._1 % 5 == 0).map { case (id, toks) => (id + 20000, toks) }
    (base ++ variants ++ copies).map { case (id, toks) => (id, toks.mkString(" ")) }
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH == exact, SimHash/capped are verified subsets, on random corpora") {
    import spark.implicits._
    Seq(42L, 1337L).foreach { seed =>
      val docs = corpus(seed, 40).toDF("doc_id", "text").cache()
      val exact = pairs(Dedup.jaccardJoin(docs, "doc_id", "text", 3, 0.7))
      assert(exact.nonEmpty, s"seed $seed produced no qualifying pairs — corpus bug")
      val lsh = pairs(Dedup.minHashLshJoin(docs, "doc_id", "text", 3, 0.7))
      assert(lsh == exact, s"seed $seed: LSH diverged from exact")
      val sim = pairs(Dedup.simHashJoin(docs, "doc_id", "text", 3, 0.7))
      assert(sim.subsetOf(exact), s"seed $seed: simhash reported a false pair")
      val capped = pairs(Dedup.jaccardJoin(docs, "doc_id", "text", 3, 0.7,
        maxShingleDf = Some(10)))
      assert(capped.subsetOf(exact), s"seed $seed: capped reported a false pair")
      // thresholds hold on every reported value
      val jacs = Dedup.jaccardJoin(docs, "doc_id", "text", 3, 0.7)
        .select("jac").collect().map(_.getDouble(0))
      assert(jacs.forall(_ >= 0.7 - 5e-5))
      // exact copies must always be found, by every algorithm
      val copyPairs = (0 until 40 by 5).map(d => (d.toLong, d + 20000L)).toSet
      assert(copyPairs.subsetOf(exact) && copyPairs.subsetOf(lsh) &&
        copyPairs.subsetOf(sim))
      docs.unpersist()
    }
  }
}
