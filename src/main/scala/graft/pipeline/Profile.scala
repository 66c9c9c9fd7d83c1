package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.text.TextOps

/**
 * Corpus data card — the per-slice statistical profile every serious
 * training-data release ships (datasheets for datasets, Gebru et al.
 * 2021): document counts, token/char volumes, exact-duplicate rate, and a
 * fixed-bucket length histogram, grouped by arbitrary slice columns
 * (source, lang, source × lang, ...).
 *
 * Everything is computed in ONE scan + ONE groupBy whose key cardinality
 * is the slice space (tens to thousands of rows — never corpus-shaped):
 * per-row features are a single codegen'd projection, every aggregate is
 * algebraic (sums, mins, maxes, count-distinct over a 64-bit content
 * hash), so partial aggregation map-side-combines and the shuffle carries
 * one partial row per (task, slice). At 100 TB this is the cheapest scan
 * in the library — and the first one a pipeline should run, because its
 * numbers (dup rate, empty-doc count, length mass) decide which of the
 * heavier operators are worth their scans.
 *
 * Exactness discipline: token counts are the whitespace convention of
 * [[TextOps.tokens]] with the empty-text guard made explicit (trim = '' →
 * 0 — `split` alone would count one phantom token), the duplicate count
 * uses count_distinct over xxhash64(text) (64-bit: collision probability
 * ~n²/2⁶⁵ — negligible below billions of DISTINCT texts per slice; the
 * oracle counts distinct raw texts and hash-matches, which IS the
 * collision check), and the histogram buckets are integer token-count
 * ranges — every output column is integral, so the DuckDB oracle
 * reproduces the card bit-for-bit.
 */
object Profile {

  /** Token-length histogram bucket edges (inclusive upper bounds; the last
    * bucket is open). Fixed, documented edges — a data card is only
    * comparable across corpora if everyone bins the same way. */
  val LenBuckets: Seq[Int] = Seq(32, 128, 512)

  /** The per-slice data card. Output: `groupCols` ++
    * (n_docs, n_distinct_texts, n_exact_dups, n_empty, total_tokens,
    * total_chars, min_tokens, max_tokens, len_le_32, len_le_128,
    * len_le_512, len_gt_512), sorted by the group columns. */
  def dataCard(docs: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "data card needs at least one slice column")
    val nTok: Column = GraftFunctions.bind(trim(col(textCol))) { t =>
      when(t === "", lit(0)).otherwise(size(split(t, "\\s+")))
    }
    val withFeatures = docs.select(
      groupCols.map(col) ++ Seq(
        nTok.cast("long").as("_nt"),
        length(col(textCol)).cast("long").as("_nc"),
        // distinct-text counting is by fingerprint, not text, so the
        // groupBy never shuffles document bodies. A bare 64-bit hash can
        // collide and silently undercount; pairing it with the length (a
        // 2nd independent 8-byte channel, already computed) pushes the
        // collision probability to ~2^-64 · P(same length) at no extra
        // shuffle width beyond 8 bytes/row.
        struct(xxhash64(col(textCol)), length(col(textCol))).as("_h")): _*)
    def bucket(lo: Long, hi: Option[Int]): Column = {
      val cond = hi match {
        case Some(h) => col("_nt") >= lo && col("_nt") <= h
        case None    => col("_nt") >= lo
      }
      sum(when(cond, 1L).otherwise(0L))
    }
    val bucketCols = {
      val edges = LenBuckets
      val lows = 1L +: edges.map(_ + 1L)
      val highs = edges.map(Some(_)) :+ None
      lows.zip(highs).map { case (lo, hi) =>
        val name = hi.map(h => s"len_le_$h").getOrElse(s"len_gt_${edges.last}")
        bucket(lo, hi).as(name)
      }
    }
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("n_docs"),
      count_distinct(col("_h")).as("n_distinct_texts"),
      (count(lit(1)) - count_distinct(col("_h"))).as("n_exact_dups"),
      sum(when(col("_nt") === 0, 1L).otherwise(0L)).as("n_empty"),
      sum(col("_nt")).as("total_tokens"),
      sum(col("_nc")).as("total_chars"),
      min(col("_nt")).as("min_tokens"),
      max(col("_nt")).as("max_tokens")) ++ bucketCols
    withFeatures
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Per-row embedding features — shared by the batch card and the
    * streaming twin. Emits `keepCols` plus (_d, _n6, _bad): dimension,
    * 6dp-decimal L2 norm (NULL for non-finite vectors — NaN would
    * otherwise cast to a silent NULL in one engine and an error in
    * another; they are counted apart), non-finite flag. A NULL vector or
    * a vector containing NULL elements counts as non-finite too (the
    * `exists` would return NULL, silently excluding the row from BOTH the
    * norm stats and the poison count — coalescing to bad closes that
    * hole). */
  private[graft] def embFeatures(df: DataFrame, vecCol: String,
      keepCols: Seq[Column]): DataFrame = {
    val v = col(vecCol)
    val normD = sqrt(aggregate(v, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val bad = coalesce(exists(v, x => isnan(x) ||
      x.cast("double") === Double.PositiveInfinity ||
      x.cast("double") === Double.NegativeInfinity), lit(true))
    df.select(keepCols ++ Seq(
      size(v).cast("long").as("_d"),
      when(!bad, round(normD, 6).cast("decimal(18,6)")).as("_n6"),
      bad.as("_bad"),
      xxhash64(v).as("_xh")): _*)
  }

  /** The algebraic (streaming-legal) half of the embedding card: every
    * aggregate map-side-combines, none is distinct-based.
    *
    * Hash-robustness discipline (the [[dataCard]] rule — "every column
    * integral so the oracle reproduces it bit-for-bit"): norm stats ship
    * as ×10⁶ BIGINTs derived from the DECIMAL(18,6) per-row norms —
    * exact integer arithmetic no engine's double canonicalization can
    * wobble. The mean ships as numerator + denominator (`norm_sum_e6`,
    * `n_finite`) rather than a rounded quotient; `norm_sum_e6 /
    * (n_finite · 10⁶)` is the average. */
  private[graft] def embAlgebraicAggs: Seq[Column] = Seq(
    count(lit(1)).as("n_vecs"),
    min(col("_d")).as("dims_min"),
    max(col("_d")).as("dims_max"),
    sum(when(col("_n6") === 0, 1L).otherwise(0L)).as("n_zero"),
    sum(when(col("_bad"), 1L).otherwise(0L)).as("n_nonfinite"),
    (min(col("_n6")) * lit(1000000)).cast("long").as("norm_min_e6"),
    (max(col("_n6")) * lit(1000000)).cast("long").as("norm_max_e6"),
    // exact decimal sum, scaled to an integral value: parallel
    // aggregation order cannot change it, and no double ever appears
    (sum(col("_n6")) * lit(1000000)).cast("long").as("norm_sum_e6"),
    count(col("_n6")).as("n_finite"))

  /** The embedding-side data card — the profile a vector corpus ships
    * before anyone trains an index on it: per-slice counts, exact-dup
    * rate, dimension range (ragged dims are the #1 silent killer of a
    * downstream ANN build — a min ≠ max row IS the alarm), zero /
    * non-finite vector counts (both poison cosine), and L2-norm
    * min/max/avg (unnormalized corpora show up here). Same contract as
    * [[dataCard]]: ONE scan + ONE slice-bounded groupBy, every aggregate
    * algebraic, map-side-combined.
    *
    * Determinism discipline: per-row norms are a sequential left fold in
    * array order (identical double arithmetic on any engine), rounded
    * once to 6dp and carried as DECIMAL(18,6); everything aggregated from
    * them ships as exact ×10⁶ BIGINTs ([[embAlgebraicAggs]]), so the
    * card's bytes are identical on any engine — no rounded double ever
    * reaches the output. Distinct counting pairs xxhash64(vec) with the 6dp norm
    * (two independent channels, same tradeoff as [[dataCard]]'s
    * hash+length pair). */
  def embeddingCard(df: DataFrame, vecCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "embedding card needs at least one slice column")
    val feats = embFeatures(df, vecCol, groupCols.map(col))
      .withColumn("_h", struct(col("_xh"), col("_n6")))
    val aggs = Seq(
      count(lit(1)).as("n_vecs"),
      count_distinct(col("_h")).as("n_distinct"),
      (count(lit(1)) - count_distinct(col("_h"))).as("n_exact_dups")) ++
      embAlgebraicAggs.tail // n_vecs already present
    feats.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(groupCols.map(col): _*)
  }
}
