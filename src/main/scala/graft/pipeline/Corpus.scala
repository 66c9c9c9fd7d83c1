package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-management utilities for training-data pipelines (north-star
 * extensions beyond the reference surface — SURVEY.md §2.7 family):
 * deterministic split assignment for train/val/test carving at corpus scale.
 */
object Corpus {

  /** Stable 0–99 bucket from the row id: the first 8 hex chars of
    * `md5(id)` as an integer, mod 100. md5 — not an engine-specific hash —
    * so the assignment is reproducible in ANY engine, and keyed on the id
    * so a document's split NEVER changes as the corpus grows (the property
    * random sampling lacks: adding data must not migrate eval docs into
    * train). Pure per-row projection — shuffle-free at any scale. */
  def splitBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("bigint"),
      lit(100L))

  /** Deterministic train/val/test assignment: buckets [0,trainPct) →
    * "train", [trainPct, trainPct+valPct) → "val", rest → "test". */
  def assignSplit(df: DataFrame, idCol: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = splitBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic ~fraction sample by the same id bucketing (keep rows
    * whose bucket < fraction·100, 1% granularity): reproducible across
    * engines and runs, no RNG state, and composable with [[assignSplit]]
    * (both read the same bucket, so a 10% sample of "train" is exactly the
    * sampled ids' train rows). The workhorse for corpus down-mixing:
    * per-source weights = a join supplying `fraction` per group. */
  def deterministicSample(df: DataFrame, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"invalid fraction $fraction")
    df.where(splitBucket(col(idCol)) < math.round(fraction * 100.0))
  }
}
