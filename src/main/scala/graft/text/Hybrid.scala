package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — reciprocal-rank fusion (RRF, Cormack et al.
  * 2009): combine two ranked lists (canonically [[Bm25]] lexical results
  * and an embedding top-k from [[graft.dedup.Dedup.topKJoin]]) without
  * score calibration, since 1/(c + rank) depends only on positions. The
  * standard production shape for "BM25 + vector" hybrid search.
  */
object Hybrid {

  /** Fuse two (qid, did, rank) lists into a top-k per query by
    *
    *   rrf = Σ_lists 1/(c + rank)
    *
    * (a document absent from one list contributes 0 for it). Output:
    * (qid, did, rrf, rank), rrf rounded to 6 places and the final rank
    * computed ON the rounded value (ties by document id) so the ordering
    * is engine-reproducible.
    *
    * Scale shape: a full-outer join of two k-bounded-per-query lists on
    * (qid, did) plus one per-query window — input sizes are `queries × k`
    * regardless of corpus size, so the fusion never touches the corpus. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(c >= 1, s"rrf constant c must be >= 1, got $c")
    val fa = a.select(col("qid"), col("did"), col("rank").as("_ra"))
    val fb = b.select(col("qid"), col("did"), col("rank").as("_rb"))
    val fused = fa.join(fb, Seq("qid", "did"), "full_outer")
      .select(col("qid"), col("did"),
        round(
          coalesce(lit(1.0) / (lit(c) + col("_ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("_rb")), lit(0.0)), 6).as("rrf"))
    val w = Window.partitionBy("qid")
      .orderBy(col("rrf").desc, col("did").asc)
    fused.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("did"), col("rrf"),
        col("rank").cast("long").as("rank"))
  }
}
