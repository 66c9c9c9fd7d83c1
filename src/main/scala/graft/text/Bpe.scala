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
    val singlePartition = vocabRows <= 65536L
    var vocab = (if (singlePartition) base.coalesce(1) else base)
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
      // r18 (guide §1.2 — the per-round cost of the small-vocab arm is
      // JOB latency, not row work: the demo-scale forced-distributed
      // oracle corpus runs 32 rounds of 2-stage groupBy + TakeOrdered
      // jobs). With the vocab coalesced to ONE partition, the
      // partition-local pair counts ARE the global counts, so the whole
      // round — count pairs, argmax with the pinned (count desc, l asc,
      // r asc) binary-UTF8 tie-break — collapses to one single-stage,
      // single-task job ([[singlePartitionBestPair]]). Multi-partition
      // vocabularies keep the distributed groupBy arm: a pair's global
      // count can win without winning any one partition.
      val best: Option[(String, String, Long)] =
        if (singlePartition) singlePartitionBestPair(current)
        else {
          val rows = current
            .where(size(col("syms")) >= 2)
            .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("l"),
                element_at(col("syms"), i + 1).as("r")))).as("p"), col("cnt"))
            .groupBy(col("p.l").as("l"), col("p.r").as("r"))
            .agg(sum(col("cnt")).as("c"))
            .orderBy(col("c").desc, col("l").asc, col("r").asc)
            .limit(1).collect()
          rows.headOption.map(b => (b.getString(0), b.getString(1), b.getLong(2)))
        }
      if (best.isEmpty || best.get._3 < minPairCount) done = true
      else {
        val (l, r) = (best.get._1, best.get._2)
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

  /** Adjacent-pair count + argmax for the SINGLE-PARTITION vocab arm, as
    * one single-stage job: the one partition's local pair counts are the
    * global counts, and the task returns just the winning (l, r, count)
    * row. The tie-break reproduces the distributed arm's
    * `orderBy(c desc, l asc, r asc)` exactly — Spark string ordering is
    * unsigned byte-wise over UTF-8 ([[utf8Lt]]), not Java's UTF-16
    * char-wise compareTo. Rows with < 2 symbols contribute no pairs (the
    * old arm's `where(size >= 2)` is subsumed). */
  private def singlePartitionBestPair(
      cur: DataFrame): Option[(String, String, Long)] = {
    import cur.sparkSession.implicits._
    cur.select(col("syms"), col("cnt")).as[(Seq[String], Long)]
      .rdd.mapPartitions { it =>
        val counts = new java.util.HashMap[(String, String), java.lang.Long]()
        it.foreach { case (syms, cnt) =>
          var i = 0
          while (i + 1 < syms.length) {
            val k = (syms(i), syms(i + 1))
            val prev = counts.get(k)
            counts.put(k, if (prev == null) cnt else prev.longValue() + cnt)
            i += 1
          }
        }
        var bl: String = null; var br: String = null; var bc = 0L
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val (l, r) = e.getKey
          val c = e.getValue.longValue()
          if (bl == null || c > bc || (c == bc &&
              (utf8Lt(l, bl) || (l == bl && utf8Lt(r, br))))) {
            bl = l; br = r; bc = c
          }
        }
        if (bl == null) Iterator.empty else Iterator.single((bl, br, bc))
      }.collect().headOption
  }

  /** Unsigned byte-wise UTF-8 "<" — Spark's UTF8String ordering, which the
    * distributed arm's orderBy ties broke with; Java String.compareTo
    * (UTF-16 code units) diverges for supplementary characters. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n) {
      val x = ab(i) & 0xff; val y = bb(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    ab.length < bb.length
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
