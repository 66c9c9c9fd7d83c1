package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{BpeEncode, BpeTokenCount, ColumnBridge}

/**
 * Corpus-trained byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016)
 * as a batch operation — the real subword tokenizer behind
 * [[graft.pipeline.Corpus]]'s packing/chunking (which previously counted
 * whitespace tokens) and [[TextOps.bpeTokenCount]]'s regex approximation.
 *
 * Scale shape:
 *
 *  - TRAIN's only corpus-scale stage is the pre-token histogram — one
 *    explode + groupBy(word) with map-side partial aggregation, the same
 *    shuffle envelope as a word-count. Everything after operates on the
 *    histogram, which is VOCABULARY-bounded (distinct pre-tokens; Heaps'
 *    law puts this in the millions even for 100 TB of text), not
 *    corpus-bounded.
 *  - The merge loop dispatches on histogram size (the engine's house
 *    size-adaptive idiom, cf. ConnectedComponents' driver union-find):
 *    below `maxDriverVocab` the histogram is collected once and trained
 *    driver-side with [[BpeReference]] — zero further Spark jobs; above
 *    it, each round is one pair-count groupBy over the vocab table + a
 *    1-row argmax collect, with lineage checkpointed every
 *    [[CheckpointEvery]] rounds so the chained merge transforms can't
 *    grow the plan unboundedly. Both arms are pinned equal by BpeSpec.
 *  - ENCODE broadcasts the bounded merge table inside the plan and runs
 *    as a single codegen'd projection: no shuffle, no join — the corpus
 *    never moves to be tokenized (plan-pinned in PlanShapeSpec).
 */
object Bpe {

  /** A trained BPE model: merge pairs in rank order (rank = index). */
  final case class Model(merges: Seq[(String, String)]) {
    def ranks: Map[(String, String), Int] = BpeReference.ranks(merges)
  }

  /** Rounds between lineage checkpoints in the distributed arm. */
  val CheckpointEvery = 8

  /** Histogram-size cutover for the driver arm (rows, not bytes: at ~40
    * bytes/entry, 2M words ≈ 80 MB driver-side — comfortably collectable;
    * corpora whose vocabulary exceeds it train distributed). */
  val DefaultMaxDriverVocab = 2000000L

  /** One greedy left-to-right merge pass of (l, r) over a symbol array —
    * the distributed mirror of [[BpeReference.mergePass]] as a codegen'd
    * HOF fold: if the accumulator ends with `l` and the next symbol is
    * `r`, replace the tail with the merged symbol, else append. A newly
    * merged symbol can never false-positive as `l` (l+r == l would need r
    * empty), so one fold IS one greedy pass. */
  private[text] def mergePassCol(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Pre-token histogram — the one corpus-scale stage. */
  private def histogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(TextOps.BpePattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` merges on the corpus' `textCol`. Semantics pinned
    * to [[BpeReference]] (same pre-tokenizer, pair weighting, tie-break,
    * early stop); `forceDistributed` pins the distributed arm for specs
    * and oracle queries. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L,
      maxDriverVocab: Long = DefaultMaxDriverVocab,
      forceDistributed: Boolean = false): Model = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val histo = histogram(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = histo.count()
      if (!forceDistributed && n <= maxDriverVocab) {
        // driver arm: one collect of the vocabulary-bounded histogram,
        // then the classic loop — zero further jobs
        val h = histo.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        Model(BpeReference.trainHistogram(h, numMerges, minPairCount))
      } else {
        Model(trainDistributed(histo, numMerges, minPairCount, n))
      }
    } finally { histo.unpersist(blocking = false); () }
  }

  /** Distributed merge loop: vocab rows are (syms array, count); each
    * round counts adjacent pairs (one groupBy over the vocab-bounded
    * table), collects the 1-row argmax, and carries accepted-but-not-yet-
    * checkpointed merges as ONE [[BpeMergeSeqApply]] kernel expression
    * over the last checkpoint (sequential greedy passes — the exact
    * training transition; pinned equal to the HOF-fold formulation in
    * BpeSpec). Words never merge INTO each other (merging never changes a
    * word's underlying string), so no re-grouping is needed between
    * rounds.
    *
    * Round-17 optimization (guide §1.2 per-task work + §7.2 plan size):
    * the previous shape chained one interpreted `aggregate(...)` HOF fold
    * per round, so between checkpoints every round re-analyzed and
    * re-evaluated an ever-deeper interpreted tree over the whole vocab
    * table; the kernel applies all pending merges in one compiled pass and
    * the plan depth stays constant. Measured on the forced-distributed
    * oracle corpus (32 merges): 73 jobs / 6.6 s → see OPTIMIZATION_r17.md
    * for the after numbers. */
  private def trainDistributed(histo: DataFrame, numMerges: Int,
      minPairCount: Long, vocabRows: Long): Seq[(String, String)] = {
    import org.apache.spark.sql.graftbridge.{BpeMergeSeqApply, ColumnBridge}
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // adaptive parallelism: each merge round is a full Spark job over the
    // vocab table, so a small vocabulary (e.g. the forced-distributed
    // oracle arm, or a narrow-domain corpus) pays 32 shuffle tasks per
    // round for rows that fit one partition — collapse to a single
    // partition below ~64k entries and the loop's per-round cost drops to
    // single-task job latency. Large vocabularies keep full parallelism.
    val base = histo.select(split(col("w"), "").as("syms"), col("cnt"))
    var vocab = (if (vocabRows <= 65536L) base.coalesce(1) else base)
      .localCheckpoint(true)
    // merges accepted since the last checkpoint, applied lazily as one
    // kernel pass per round (never re-materialized until the checkpoint)
    var pending = Vector.empty[(String, String)]
    def current: DataFrame =
      if (pending.isEmpty) vocab
      else vocab.select(ColumnBridge.column(BpeMergeSeqApply(
        ColumnBridge.expression(col("syms")), pending)).as("syms"), col("cnt"))
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val best = current
        .where(size(col("syms")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += ((l, r))
        pending = pending :+ ((l, r))
        // periodically materialize the pending merges so the per-round
        // kernel pass stays bounded (release the superseded checkpoint's
        // blocks — the ConnectedComponents discipline)
        if (pending.size >= CheckpointEvery) {
          val next = current.localCheckpoint(true)
          ColumnBridge.releaseLocalCheckpoint(vocab)
          vocab = next
          pending = Vector.empty
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Subword tokens of `text` under `model` — array<string>, one codegen'd
    * projection, merge table broadcast in the plan. */
  def encode(text: Column, model: Model): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), model.merges))

  /** Token count under `model` without materializing the array. */
  def tokenCount(text: Column, model: Model): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text), model.merges))

  /** The merge table as a (rank, l, r) frame (rank 1-based). */
  def mergesDF(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1L, l, r) }
      .toDF("rank", "l", "r")
  }
}
