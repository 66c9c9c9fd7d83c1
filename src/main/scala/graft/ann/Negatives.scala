package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hard-negative mining for contrastive training (the DPR / FaceNet /
 * SimCSE data-prep staple; an extension beyond the reference's surface —
 * its GetSimN is single-query, unlabeled: `ahnlich/db/src/engine/
 * store.rs:290-398`). For every query vector: the k most-similar corpus
 * vectors with a DIFFERENT label ("hard negatives" — the confusable
 * examples a contrastive loss learns most from), plus the query's best
 * same-label cosine (`pos_cos`, the positive anchor) so callers can apply
 * the semi-hard rule (keep negatives less similar than the positive) as a
 * plain filter on the output instead of a second mining pass.
 *
 * Scale shape: the query side is the bounded one (a training batch / a
 * sampled anchor set) — it broadcasts; the corpus STREAMS through two
 * scans (negatives, positive anchors), never materializing the N×M score
 * matrix. The negatives arm folds scored pairs into bounded per-task
 * heaps ([[BoundedTopK]] — shuffle carries ≤ tasks × queries × k rows,
 * never the product); the positives arm is a map-side-combined max per
 * qid (G rows out). Both-sides-large: route the negatives arm through the IVF index
 * ([[Ivf.topKJoin]]) with the label filter applied inside probed cells and
 * k widened to survive the filter — same composition as the quantized
 * arms; the anchor max is unchanged (it is an aggregation, not a top-k).
 *
 * `semi_hard` compares ROUNDED (4 dp) cosines: the flag must be decided on
 * the same numbers the output reports (and the oracle replays), not on
 * sub-rounding float noise.
 */
object Negatives {

  /** Mine hard negatives: (qid, cid, neg_cos, pos_cos, rank, semi_hard),
    * rank 1..k by cosine descending (cid ascending on ties) over corpus
    * rows whose `cLabel` differs from the query's `qLabel`. `pos_cos` is
    * the query's max cosine to a same-label, different-id corpus row
    * (NULL when the query's label has no other member — then `semi_hard`
    * is NULL too, never a fabricated flag). Self-pairs (same id) are
    * excluded from both arms.
    *
    * NULL labels fail LOUDLY on either side (in-plan raise_error, the
    * corpusDiff/writePartitioned discipline): both arms filter on label
    * equality, so a NULL-labeled row would silently vanish from the
    * output — neither a negative nor a positive — which is row loss, not
    * semantics. Assign real labels (or filter explicitly) first. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      qId: String, qVec: String, qLabel: String,
      cId: String, cVec: String, cLabel: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = broadcast(queries.select(
      col(qId).as("qid"), col(qVec).as("qv"),
      requireLabel(qLabel, "query").as("ql")))
    val c = corpus.select(
      col(cId).as("cid"), col(cVec).as("cv"),
      requireLabel(cLabel, "corpus").as("cl"))
    val scored = q.crossJoin(c)
      .where(col("qid") =!= col("cid"))
      .withColumn("cos", graft.dedup.Dedup.cosine(col("qv"), col("cv")))
    // positive anchor: max same-label cosine — partial max map-side, the
    // shuffle carries one row per query
    val pos = scored.where(col("cl") === col("ql"))
      .groupBy("qid").agg(max(col("cos")).as("pc"))
    // hard negatives: per-query top-k over different-label rows, through
    // the bounded per-task fold — never a window sort of the broadcast
    // product (graft.ann.BoundedTopK; the measured cliff is in SCALE.md)
    val negs = BoundedTopK.topK(
      scored.where(col("cl") =!= col("ql"))
        .select(col("qid"), col("cid"), col("cos")),
      "qid", "cid", "cos", k)
    negs.join(broadcast(pos), Seq("qid"), "left")
      .select(col("qid"), col("cid"),
        round(col("score"), 4).as("neg_cos"),
        round(col("pc"), 4).as("pos_cos"),
        col("rank"),
        (round(col("score"), 4) < round(col("pc"), 4)).as("semi_hard"))
  }

  /** In-plan NULL-label guard: the label value, or raise_error on NULL.
    * Riding inside the projected column (not a dropped check column, which
    * the optimizer would prune away) guarantees the probe runs exactly
    * where the label is read. Shared by the broadcast arm above and
    * [[IvfIndex.hardNegatives]]. */
  private[ann] def requireLabel(labelCol: String, side: String) = {
    val c = col(labelCol)
    when(c.isNull, raise_error(lit(
      s"hardNegatives: NULL $side label ($labelCol) — a NULL-labeled row " +
        "would silently vanish from both arms; assign or filter first")))
      .otherwise(c)
  }
}
