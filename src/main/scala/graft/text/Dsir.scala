package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, NbModelTable, NbScore}

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw-corpus
  * document by the log-likelihood ratio of its hashed n-gram features
  * under the TARGET corpus (the high-quality domain to match) vs the raw
  * corpus itself; resampling proportionally to the weight shifts the raw
  * corpus toward the target distribution. The reference engine has no
  * such operator; SURVEY §2.7 extension from the published technique.
  */
object Dsir {

  /** Unigram + bigram feature OCCURRENCES of each doc, hashed into
    * `buckets` via [[graft.pipeline.Corpus.idBucket]] — the ONE
    * engine-reproducible md5-prefix derivation every deterministic op
    * shares (mirrorable in any engine, unlike xxhash64). Hashing IS the
    * model here (DSIR's hashed feature space), not an optimization. */
  private def features(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
      .select(col("id"), explode(concat(col("tk"),
        when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ",
              element_at(col("tk"), i), element_at(col("tk"), i + 1))))
          .otherwise(array().cast("array<string>")))).as("f"))
      .select(col("id"),
        graft.pipeline.Corpus.idBucket(col("f"), buckets).as("b"))

  /** Per-document importance weight (log scale):
    *
    *   dsir(d) = Σ_{f ∈ d} [ ln p̂_target(f) − ln p̂_raw(f) ]
    *
    * with add-k-smoothed bucket probabilities p̂(b) = (c(b)+k)/(n+k·B).
    * Output: (idCol, dsir), rounded to 4 places; high = target-like.
    * Callers resample with probability ∝ exp(dsir) (or rank-select).
    * A target corpus with no features raises at execution time rather
    * than emitting silent all-NULL scores.
    *
    * Scale shape: the two count tables are bucket-bounded (≤ `buckets`
    * rows) hash-groupBys with map-side combine — the ONLY corpus-wide
    * aggregations, and they ARE the model, so they are collected once
    * (≤ `buckets` rows each, never corpus-sized) and folded driver-side
    * into one flat per-bucket log-ratio table. Scoring then rides
    * [[org.apache.spark.sql.graftbridge.NbScore]] with that table as a
    * single-class model: each doc's Σ ln-ratio folds inside the kernel —
    * a pure narrow map, no feature-stream join, no per-doc shuffle (the
    * join+groupBy formulation survives as
    * [[importanceWeightsViaShuffle]], pinned equal in DsirSpec).
    * An empty target fails loudly here, at model build. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 10007, k: Double = 1.0): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(k > 0, s"smoothing k must be > 0, got $k")
    val ct = new Array[Long](buckets)
    val cr = new Array[Long](buckets)
    features(target, idCol, textCol, buckets).groupBy("b")
      .agg(count(lit(1)).as("ct")).collect()
      .foreach(r => ct(r.getLong(0).toInt) = r.getLong(1))
    features(raw, idCol, textCol, buckets).groupBy("b")
      .agg(count(lit(1)).as("cr")).collect()
      .foreach(r => cr(r.getLong(0).toInt) = r.getLong(1))
    val nt = ct.sum
    if (nt == 0L)
      throw new IllegalArgumentException("DSIR: target corpus has no features")
    val nr = cr.sum
    // per-bucket ln p̂_target − ln p̂_raw, the same double math as the
    // shuffle formulation's log((c+k)/(n+k·B)) terms
    val w = Array.tabulate(buckets)(b =>
      math.log((ct(b) + k) / (nt + k * buckets)) -
        math.log((cr(b) + k) / (nr + k * buckets)))
    val nb = ColumnBridge.column(NbScore(
      ColumnBridge.expression(TextOps.tokens(col(textCol))),
      new NbModelTable(w, buckets, 1)))
    // null text produced no feature rows under explode; drop explicitly
    raw.where(col(textCol).isNotNull)
      .select(col(idCol), round(element_at(nb, 1), 4).as("dsir"))
  }

  /** The pre-kernel scoring shape — broadcast the merged count table,
    * join the exploded feature stream, fold one groupBy(id) — kept as
    * the independent Spark-native formulation the kernel path is
    * differentially pinned against (DsirSpec). */
  private[text] def importanceWeightsViaShuffle(raw: DataFrame,
      target: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10007, k: Double = 1.0): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(k > 0, s"smoothing k must be > 0, got $k")
    val rawF = features(raw, idCol, textCol, buckets)
    val tCounts = features(target, idCol, textCol, buckets)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val rCounts = rawF.groupBy("b").agg(count(lit(1)).as("cr"))
    // both count tables are ≤ `buckets` rows — merge them once (full
    // outer so the totals see every bucket), fold the corpus totals in as
    // single-partition window sums over the tiny merged table (no extra
    // corpus scans for nt/nr), and BROADCAST, so the per-occurrence
    // feature stream is never shuffled to meet the counts; past ~1M
    // buckets fall back to a shuffled join
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val counts = rCounts.join(tCounts, Seq("b"), "full_outer")
      .select(col("b"), col("ct"), col("cr"),
        sum(col("ct")).over(w).as("nt"), sum(col("cr")).over(w).as("nr"))
    val countsSide = if (buckets <= 1000000) broadcast(counts) else counts
    // an empty target has no features anywhere: nt is NULL — fail loudly
    // instead of emitting silent all-NULL scores
    val ntSafe = when(col("nt").isNull,
      raise_error(lit("DSIR: target corpus has no features")).cast("bigint"))
      .otherwise(col("nt"))
    rawF.join(countsSide, Seq("b")) // inner: raw features always have cr
      .select(col("id"),
        (log((coalesce(col("ct"), lit(0L)) + lit(k)) /
             (ntSafe + lit(k * buckets))) -
         log((col("cr") + lit(k)) /
             (col("nr") + lit(k * buckets)))).as("s"))
      .groupBy("id").agg(round(sum(col("s")), 4).as("dsir"))
      .select(col("id").as(idCol), col("dsir"))
  }
}
