package graft.ann

/**
 * Shared statistics for measured recall-vs-probes operating curves —
 * the instrument behind [[RoutedAnnIndex.calibrate]] and
 * [[IvfIndex.calibrate]]. A curve point is (probes, mean recall@k,
 * standard error of the mean); the stderr is load-bearing: a 100-query
 * sample estimates the steep part of a curve to ~±1pt (measured at
 * 200k — SCALE.md round 13), so selection defaults to the one-sided
 * 95% lower confidence bound rather than the point estimate.
 */
private[ann] object Calibration {

  /** Mean and standard error (sample sd / √n) of per-query recalls. */
  def meanSe(per: Seq[Double]): (Double, Double) = {
    val n = per.size
    val mean = per.sum / n
    val sd = math.sqrt(per.map(x => (x - mean) * (x - mean)).sum /
      math.max(1, n - 1))
    (mean, sd / math.sqrt(n.toDouble))
  }

  /** The SMALLEST curve point meeting `target` — at the one-sided 95%
    * LCB (mean − 1.645·se) when `conservative`, at the raw mean
    * otherwise. `exhaustive` when uncalibrated or no point qualifies —
    * a recall target is a floor, never a budget — and ALWAYS for a
    * target of exactly 1.0: a finite sample can certify an estimate,
    * never perfection. */
  def select(curve: Seq[(Int, Double, Double)], target: Double,
      conservative: Boolean, exhaustive: Int): Int = {
    require(target > 0.0 && target <= 1.0,
      s"recall target must be in (0, 1], got $target")
    if (target >= 1.0) return exhaustive
    curve.sortBy(_._1)
      .find { case (_, mean, se) =>
        (if (conservative) mean - 1.645 * se else mean) >= target }
      .map(_._1).getOrElse(exhaustive)
  }

  /** Measurement ladder: the caller's points (those outside [1, max] are
    * DROPPED) or powers of two below `max` — either way topped with `max`
    * itself, so the exhaustive point is always measured. Returns a
    * distinct ascending sequence. */
  def ladder(explicit: Seq[Int], max: Int): Seq[Int] =
    ((if (explicit.nonEmpty) explicit
      else Iterator.iterate(1)(_ * 2).takeWhile(_ < max).toSeq)
      .filter(p => p >= 1 && p <= max).distinct.sorted :+ max).distinct

  /** Draw up to `n` query vectors from a caller-supplied frame — the
    * external-sample arm shared by both calibrators (`None` own-ids:
    * leave-one-out never applies to external queries). */
  def externalSample(qdf: org.apache.spark.sql.DataFrame, qVecCol: String,
      n: Int, seed: Long): Array[(Option[Long], Array[Float])] =
    qdf.select(org.apache.spark.sql.functions.col(qVecCol).cast("array<float>"))
      .rdd.map(r => (None: Option[Long], r.getSeq[Float](0).toArray))
      .takeSample(withReplacement = false, n, seed)

  /** Collected (qid, cid, rank) rows → per-query LOO-filtered top-k sets:
    * rank-sorted, the query's own id dropped (self-samples), the top-k
    * prefix kept — the result-side protocol shared by both calibrators. */
  def rankedSets(rows: Array[org.apache.spark.sql.Row], k: Int,
      ownIds: Array[Option[Long]]): Map[Int, Set[Long]] =
    rows.groupBy(_.getLong(0)).map { case (q, rs) =>
      q.toInt -> rs.sortBy(_.getLong(2)).map(_.getLong(1))
        .filter(id => !ownIds(q.toInt).contains(id)).take(k).toSet }
}
