package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch event-stream relational extensions (no reference analog — the
 * reference has no joins at all, SURVEY §2.7; these are the enrichment
 * shapes an event/training-data pipeline needs and Spark SQL lacks as
 * built-ins).
 */
object EventOps {

  /** AS-OF JOIN: for every left row, the LATEST right row with the same
    * `key` and right ts ≤ left ts (inclusive), optionally within
    * `toleranceUs` microseconds — the classic point-in-time enrichment
    * (each purchase joined to the view that preceded it; each trade to the
    * quote in force). Spark has no asof join; the standard workaround — a
    * range join + per-left-row max — explodes to |left|·|right-per-key|
    * intermediate rows. This is the UNION-AND-SWEEP formulation instead:
    *
    *  - right rows are first collapsed to ONE per (key, ts) — the
    *    lexicographically greatest payload struct wins — so the match is
    *    deterministic when right has same-instant duplicates;
    *  - both sides union into one (key, ts, side, payload) stream,
    *    right-before-left at equal ts (side 0 < 1 ⇒ ties match inclusively);
    *  - one window per key ordered by (ts, side) carries
    *    `last(payload, ignoreNulls)` forward — each left row reads the
    *    sweep state at its own position;
    *  - left rows project out, with the match nulled when it misses the
    *    tolerance.
    *
    * Cost: ONE shuffle of |left| + |right-distinct| narrow rows on `key`,
    * one per-key sort (the window), zero joins — at 100 TB this is the
    * sessionization shape (same partitioning, same skew profile: a hot key
    * is a hot user), not a join blow-up.
    *
    * `leftTs` / `rightTs` must be LONG epoch-microsecond columns (the
    * engine-portable currency — see sessionizeBatch); `rightCols` are the
    * right-side columns to carry (must not collide with left's names).
    * Output: every left column + each carried column as `matched_<name>`
    * + `matched_ts_us` (all NULL when no right row qualifies). */
  def asofJoin(left: DataFrame, leftTs: String, right: DataFrame,
      rightTs: String, key: String, rightCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin needs at least one carried column")
    require(!rightCols.contains(rightTs),
      s"$rightTs is always carried as matched_ts_us — listing it in " +
        "rightCols would emit a duplicate column")
    // the sweep's working columns are flat names in the unioned frame; an
    // input already carrying one would produce an ambiguous reference (or a
    // silently shadowed output) instead of a clear error — refuse up front,
    // like the rightTs guard above
    val reserved = Set("_ts", "_side", "_rp", "_lp", "_m")
    for ((side, cols) <- Seq("left" -> left.columns, "right" -> right.columns);
         c <- cols if reserved(c))
      throw new IllegalArgumentException(
        s"asofJoin $side input column `$c` collides with an internal " +
          s"working column (reserved: ${reserved.mkString(", ")}) — rename it")
    val outNames = "matched_ts_us" +: rightCols.map(c => s"matched_$c")
    for (c <- left.columns if outNames.contains(c))
      throw new IllegalArgumentException(
        s"asofJoin left column `$c` collides with an output column — rename it")
    // equi-join NULL semantics: a NULL key matches nothing, but the window
    // partitions NULL keys together, so null-key right rows would sweep
    // into null-key left rows. Drop them; null-key left rows then read an
    // empty sweep state and come out unmatched (NULL), exactly like a join.
    val payload = struct(col(rightTs).as("ts") +: rightCols.map(col): _*)
    // one right row per (key, ts): greatest payload struct (deterministic)
    val r = right.where(col(key).isNotNull).groupBy(col(key), col(rightTs))
      .agg(max(payload).as("_rp"))
      .select(col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
        col("_rp"))
    val leftCols = left.columns.toSeq
    val l = left
      .select(col(key), col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(r.schema("_rp").dataType).as("_rp"),
        struct(leftCols.map(col): _*).as("_lp"))
    val unioned = r.withColumn("_lp", lit(null).cast(l.schema("_lp").dataType))
      .unionByName(l)
    val w = Window.partitionBy(key).orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = unioned
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val inTol = toleranceUs.fold(col("_m").isNotNull)(t =>
      col("_m").isNotNull && col("_ts") - col("_m.ts") <= t)
    val matched = when(inTol, col("_m"))
    swept.select(
      leftCols.map(c => col(s"_lp.$c").as(c)) ++
        (matched.getField("ts").as("matched_ts_us") +:
          rightCols.map(c => matched.getField(c).as(s"matched_$c"))): _*)
  }

  /** INTERVAL JOIN: every (left, right) pair with the same `key` whose
    * right timestamp falls in [left + lowerUs, left + upperUs] — the
    * all-matches sibling of [[asofJoin]]'s latest-one (attribution windows,
    * "views within the hour before each purchase", quote context around a
    * trade). Timestamps are LONG epoch-micros, like everything here.
    *
    * Plan shape matters more than it looks: the range condition alone
    * would plan a cartesian/broadcast-nested-loop; keyed as an EQUI-join
    * on `key` with the interval as a post-join filter it is one ordinary
    * shuffled hash join — |left|+|right| narrow rows shuffle on the key,
    * matched volume is bounded by per-key event density × window width,
    * and skew follows the key distribution (AQE skew-split territory, same
    * as sessionize). Left columns pass through; right columns arrive as
    * `matched_<name>` + `matched_ts_us` — same contract as [[asofJoin]],
    * minus the at-most-one guarantee (inner semantics: unmatched left rows
    * are absent; as-of's enrichment NULL would multiply here). */
  def intervalJoin(left: DataFrame, leftTs: String, right: DataFrame,
      rightTs: String, key: String, rightCols: Seq[String],
      lowerUs: Long, upperUs: Long): DataFrame = {
    require(lowerUs <= upperUs, s"empty interval [$lowerUs, $upperUs]")
    require(!rightCols.contains(rightTs),
      s"$rightTs is always carried as matched_ts_us — listing it in " +
        "rightCols would emit a duplicate column")
    // same collision discipline as asofJoin: working + output names must
    // not already exist on the left (right columns are renamed away)
    val iOutNames = "_rts" +: "matched_ts_us" +: rightCols.map(c => s"matched_$c")
    for (c <- left.columns if iOutNames.contains(c))
      throw new IllegalArgumentException(
        s"intervalJoin left column `$c` collides with a working/output " +
          "column — rename it")
    val r = right.select((col(key) +: col(rightTs).as("_rts") +:
      rightCols.map(c => col(c).as(s"matched_$c"))): _*)
    left.join(r, Seq(key))
      .where(col("_rts") >= col(leftTs) + lowerUs &&
        col("_rts") <= col(leftTs) + upperUs)
      .select(left.columns.map(col) ++
        (col("_rts").as("matched_ts_us") +:
          rightCols.map(c => col(s"matched_$c"))): _*)
  }
}
