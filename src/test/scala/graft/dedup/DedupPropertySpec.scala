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

  /** Driver-side reference of [[Dedup.removeRepeatedSpans]]: brute-force
    * gram census, cut = (positions covered by a non-first occurrence) −
    * (positions covered by ANY first occurrence) — the exact engine
    * contract, computed with plain collections. */
  private def referenceSpans(docs: Seq[(Long, String)], n: Int,
      minOcc: Int): Map[Long, String] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val occ = for {
      (id, tk) <- toks if tk.size >= n
      i <- 1 to (tk.size - n + 1)
    } yield (tk.slice(i - 1, i - 1 + n).mkString(" "), id, i)
    val cut = scala.collection.mutable.Set[(Long, Int)]()
    val firstCovered = scala.collection.mutable.Set[(Long, Int)]()
    occ.groupBy(_._1).values.filter(_.size >= minOcc).foreach { os =>
      val sorted = os.sortBy(o => (o._2, o._3))
      val (_, fid, fpos) = sorted.head
      (fpos until fpos + n).foreach(j => firstCovered += ((fid, j)))
      sorted.tail.foreach { case (_, id, p) =>
        (p until p + n).foreach(j => cut += ((id, j))) }
    }
    val reallyCut = cut -- firstCovered
    toks.flatMap { case (id, tk) =>
      val kept = tk.zipWithIndex.collect {
        case (t, i0) if !reallyCut((id, i0 + 1)) => t }
      if (kept.isEmpty) None else Some(id -> kept.mkString(" "))
    }.toMap
  }

  test("removeRepeatedSpans matches the driver-side reference on random corpora") {
    import spark.implicits._
    Seq(7L, 2024L).foreach { seed =>
      // the copy/variant corpus guarantees long duplicated passages, plus
      // a periodic doc to stress self-overlapping spans
      val base = corpus(seed, 30) :+ (99999L, Seq.fill(9)("per").mkString(" "))
      val want = referenceSpans(base, n = 5, minOcc = 2)
      val got = Dedup.removeRepeatedSpans(
          base.toDF("doc_id", "text"), "doc_id", "text", n = 5)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got == want, {
        val diff = (got.keySet ++ want.keySet).filter(k => got.get(k) != want.get(k))
        s"seed $seed: ${diff.size} docs diverge, e.g. ${diff.take(3).map(k =>
          (k, got.get(k), want.get(k)))}"
      })
      // something must actually have been cut, or the corpus is too easy
      assert(got != base.toMap, s"seed $seed cut nothing — corpus bug")
    }
  }
}
