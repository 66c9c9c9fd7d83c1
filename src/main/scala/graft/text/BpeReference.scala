package graft.text

import scala.collection.mutable

/**
 * Single-node reference implementation of byte-pair encoding — the classic
 * algorithm of Sennrich, Haddow & Birch, "Neural Machine Translation of
 * Rare Words with Subword Units" (ACL 2016), operating on a word-count
 * histogram exactly as their published `get_stats`/`merge_vocab` pseudocode.
 *
 * This object is deliberately Spark-free. It serves three roles:
 *
 *  1. the differential REFERENCE for [[Bpe]]'s distributed trainer and
 *     encode kernel (the BM25/spans idiom: an independent driver-side
 *     implementation the distributed one must hash-match);
 *  2. the DRIVER ARM of [[Bpe.train]]'s size-adaptive dispatch — the word
 *     histogram is vocabulary-bounded, not corpus-bounded, so below the
 *     cutover it is collected and trained here in one pass with zero
 *     further Spark jobs;
 *  3. the source of the oracle literals for the `pipeline_bpe*` queries
 *     (the merges are a pure function of a deterministic corpus, so the
 *     DuckDB side can carry them as VALUES).
 *
 * Pinned semantics (shared by the distributed trainer, the encode kernel,
 * and the DuckDB oracle CTE — all four must agree exactly):
 *  - pre-tokenization: [[TextOps.BpePattern]] (GPT-style leading-space
 *    attachment; whitespace between pre-tokens is dropped);
 *  - symbols are Unicode CODEPOINTS (a surrogate pair is one symbol);
 *  - pair counting weights every adjacent position, overlaps included
 *    (Sennrich's get_stats);
 *  - best pair = (count DESC, left ASC, right ASC) — the lexicographic
 *    tie-break makes training deterministic (ASCII-safe: Java string
 *    order and UTF8 binary order agree on ASCII, which is all the oracle
 *    corpora use);
 *  - training stops early when the best pair's count drops below
 *    `minPairCount` (a pair seen once compresses nothing);
 *  - a merge is applied as ONE left-to-right greedy pass per word
 *    ("aaaa" + (a,a) → [aa, aa], never [aa, a, a]);
 *  - encoding applies the lowest-RANK pair present, leftmost occurrence
 *    first, until none applies — equivalent to replaying merges in rank
 *    order, because any pair containing a merged symbol necessarily has a
 *    higher rank than the merge that created it.
 */
object BpeReference {

  private val Pre = java.util.regex.Pattern.compile(TextOps.BpePattern)

  def pretokenize(text: String): Vector[String] = {
    val m = Pre.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Split into codepoint symbols ("héllo🙂" → h, é, l, l, o, 🙂). */
  def charSplit(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** One greedy left-to-right merge pass of (l, r) over a symbol array. */
  def mergePass(syms: Array[String], l: String, r: String): Array[String] = {
    // fixpoint fast path (r18): a symbol array without an (l, r)
    // adjacency is returned UNCHANGED (same instance, zero allocation) —
    // most words don't contain any given pair, and the trainer applies
    // one pass per pending merge to every vocab row (callers treat the
    // arrays as immutable). The scan is the same comparisons the copying
    // loop would have done; output is byte-identical either way.
    var p = 0
    var found = false
    while (!found && p + 1 < syms.length) {
      if (syms(p) == l && syms(p + 1) == r) found = true else p += 1
    }
    if (!found) return syms
    val out = new mutable.ArrayBuffer[String](syms.length - 1)
    var i = 0
    while (i < p) { out += syms(i); i += 1 }
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  def wordHistogram(corpus: Seq[String]): Seq[(String, Long)] = {
    val h = mutable.HashMap.empty[String, Long]
    corpus.foreach(t => pretokenize(t).foreach(w =>
      h.update(w, h.getOrElse(w, 0L) + 1L)))
    h.toSeq
  }

  def train(corpus: Seq[String], numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] =
    trainHistogram(wordHistogram(corpus), numMerges, minPairCount)

  /** The Sennrich loop over a (word, count) histogram. Recounting all
    * pairs each round is O(merges × total symbols) — acceptable precisely
    * because the histogram is vocabulary-bounded (the corpus-scale work,
    * the word COUNT, happened before this is called). */
  def trainHistogram(histogram: Seq[(String, Long)], numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var vocab: Array[(Array[String], Long)] =
      histogram.iterator.map { case (w, c) => (charSplit(w), c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minPairCount) done = true
        else {
          merges += ((l, r))
          vocab = vocab.map { case (syms, cnt) => (mergePass(syms, l, r), cnt) }
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Encode one pre-token: repeatedly merge the lowest-rank adjacent pair
    * present (leftmost occurrence first) until none applies. */
  def encodeWord(w: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = charSplit(w)
    var continue = true
    while (continue && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i + 1 < syms.length) {
        rank.get((syms(i), syms(i + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bestPos = i }
        }
        i += 1
      }
      if (bestPos < 0) continue = false
      else {
        val merged = syms(bestPos) + syms(bestPos + 1)
        syms = (syms.take(bestPos) :+ merged) ++ syms.drop(bestPos + 2)
      }
    }
    syms
  }

  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  def encode(text: String, merges: Seq[(String, String)]): Vector[String] = {
    val rk = ranks(merges)
    pretokenize(text).flatMap(w => encodeWord(w, rk))
  }
}
