package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over a candidate-pair graph — the step that turns a
 * near-dup PAIR list (`Dedup.jaccardJoin` / `minHashLshJoin` / `simHashJoin` /
 * `cosineNearDupJoin` output) into usable CLUSTERS: duplicates chain (a~b,
 * b~c but a!~c), so keep-one semantics need the transitive closure, not the
 * raw pairs.
 *
 * Algorithm: distributed min-label propagation with POINTER JUMPING. Each
 * round does two label updates:
 *   1. neighbor min: L(u) <- min(L(u), min over edges (u,v) of L(v))
 *   2. pointer jump: L(u) <- min(L(u), L(L(u)))   (path halving)
 * Plain neighbor propagation alone needs O(diameter) rounds — a 1M-doc
 * chain would need 1M shuffles; the jump step halves every label path per
 * round, giving O(log n) convergence on any topology (the same doubling
 * idea as the MapReduce large-star/small-star algorithm of Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC'14). Each round is
 * two keyed shuffles over the label table (|V| rows — BOUNDED BY NODES THAT
 * APPEAR IN A PAIR, not the corpus) and is localCheckpoint'ed: lineage
 * stays one round deep, so round N's plan never re-derives rounds 1..N-1.
 *
 * Driver involvement per round is ONE scalar (the changed-label count used
 * as the convergence test); labels and edges never leave the cluster.
 */
object ConnectedComponents {

  /** Edge-count cutover below which [[label]] runs a driver-side
    * union-find instead of distributed rounds. The pair list is bounded by
    * the DUPLICATE population, not the corpus — most corpora, even huge
    * ones, produce pair graphs far under this — and at 1M edges the
    * collect is ~16 MB while the distributed alternative pays ~10 scheduled
    * jobs to label a few thousand nodes (measured 1.55 s vs ~0.1 s at
    * sf0.1's 572 nodes). Same adaptive-cutover discipline as the engine's
    * ≤4096 filtered-search brute-force arm. */
  val DriverUnionFindCutover = 1000000L

  /** Labels every node of the pair graph with its component representative
    * (the MINIMUM node id in the component — deterministic, join-free to
    * interpret). Output: (id, component), one row per distinct node
    * appearing in `pairs`; singleton corpus rows (no pair) are absent by
    * construction — callers treat absence as "its own component".
    *
    * Size-adaptive: pair graphs at or under `driverCutover` edges collect
    * to a driver union-find (milliseconds, zero shuffles); larger graphs —
    * the 100 TB duplicate-heavy case — run the distributed pointer-jumping
    * rounds. Both arms produce the IDENTICAL labeling (min-id
    * representative; ConnectedComponentsSpec pins the agreement).
    *
    * `maxIter` is a safety bound, not a tuning knob: pointer jumping
    * converges in ~log2(largest component) + 2 rounds (a 2^50-node chain
    * would need ~52). Throws if the bound is hit with labels still moving —
    * silently returning a half-converged labeling would corrupt keep-one
    * downstream. */
  def label(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50,
      driverCutover: Long = DriverUnionFindCutover): DataFrame = {
    val e0 = pairs.select(col(aCol).cast("long").as("u"),
      col(bCol).cast("long").as("v")).where(col("u") =!= col("v"))
    // one bounded-cost count decides the arm: callers hand in eager
    // (checkpointed) pair frames, so this scans node-local blocks. A lazy
    // expensive `pairs` plan would run twice — the near-dup joins all
    // return materialized pairs by contract (see Dedup's lifecycle note).
    // the probe counts at most cut+1 rows; cutovers beyond the probe's
    // int-limit range are capped, so an oversized driverCutover can never
    // silently turn the driver arm into an unbounded collect
    val cut = math.min(driverCutover, Int.MaxValue.toLong - 2)
    if (cut >= 0 && e0.limit((cut + 1).toInt).count() <= cut)
      return labelViaDriver(e0)
    // both orientations, so min labels flow against the original edge
    // direction too; distinct keeps the per-round join width minimal
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().persist()
    try {
      // seed: own id (the neighbor-min step folds in the first hop)
      var labels = edges.select(col("u")).distinct()
        .select(col("u"), col("u").as("l"))
        .localCheckpoint() // eager: seed once, not per round
      var iter = 0
      var converged = false
      while (!converged) {
        if (iter >= maxIter)
          throw new IllegalStateException(
            s"connected components did not converge in $maxIter rounds")
        // 1. neighbor min over the edge relation
        val nbrMin = edges
          .join(labels.select(col("u").as("v"), col("l").as("lv")), "v")
          .groupBy("u").agg(min(col("lv")).as("nl"))
        // carry the round-entry label (`lp`) through both updates so the
        // convergence test below needs no join back to the previous table
        val stepped = labels.join(nbrMin, Seq("u"), "left")
          .select(col("u"), col("l").as("lp"),
            least(col("l"), coalesce(col("nl"), col("l"))).as("l1"))
        // 2. pointer jump: L(L(u)) — self-join of the label table
        val jumped = stepped.as("x")
          .join(stepped.select(col("u").as("l1"), col("l1").as("ll")).as("y"),
            Seq("l1"), "left")
          .select(col("u"), col("lp"),
            least(col("l1"), coalesce(col("ll"), col("l1"))).as("l"))
          .localCheckpoint() // cut lineage: next round starts from stored blocks
        // ONE scalar to the driver: did any label move this round? A plain
        // scan of the just-checkpointed blocks — shuffle-free, unlike the
        // old third join back to the previous label table
        val changed = jumped.where(col("l") =!= col("lp")).limit(1).count()
        // the previous round's checkpoint blocks are dead once `jumped` is
        // materialized — release them, or `iter` copies of the label table
        // pile up in block-manager storage until driver GC (the Pq.train
        // leak, same fix; back-to-back bench runs otherwise inherit the
        // previous run's unreleased blocks)
        org.apache.spark.sql.graftbridge.ColumnBridge
          .releaseLocalCheckpoint(labels)
        labels = jumped.select(col("u"), col("l"))
        converged = changed == 0
        iter += 1
      }
      labels.select(col("u").as("id"), col("l").as("component"))
    } finally edges.unpersist(blocking = false)
  }

  /** Driver union-find over a SMALL edge list (≤ [[DriverUnionFindCutover]]
    * rows — a bounded collect, like the engine's probe-hash collects): path
    * compression + min-root union, so each component's root IS its minimum
    * id — exactly the distributed arm's labeling. */
  private def labelViaDriver(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.as[(Long, Long)].collect().foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
    }
    val labeled = parent.keys.toSeq.sorted.map(id => (id, find(id)))
    spark.createDataset(labeled).toDF("id", "component")
  }

  /** Keep-one projection over a NEAR-dup pair graph: drops every corpus row
    * whose id sits in a component with a smaller member (the component
    * representative survives; singletons — rows in no pair — survive by
    * absence from the label table). The drop set is (id != component) rows
    * of [[label]] — bounded by the duplicate population, anti-joined
    * against the corpus on the id key: the corpus shuffles once on id and
    * is never compared content-wise here. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val doomed = label(pairs, aCol, bCol)
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(doomed, Seq(idCol), "left_anti")
  }

  /** Quality-ranked keep-one: like [[dropNearDuplicates]], but each
    * component's survivor is the member with the HIGHEST `rankCol` value
    * (ties → lowest id), not the minimum id — the keeper policy of the
    * dedup recipes that rank members by a quality signal (document length,
    * classifier score, perplexity head-ness) before dropping: min-id
    * keep-one discards quality information the pipeline already computed.
    *
    * Scale shape: ranks are fetched by an id equi-join against the label
    * table (bounded by the DUPLICATE population, never corpus-shaped), the
    * winner is one window over that bounded set partitioned by component,
    * and the corpus pays the same single anti-join on id as min-id
    * keep-one. Rows in no pair survive by absence, as before. */
  def dropNearDuplicatesKeepBest(df: DataFrame, idCol: String,
      rankCol: String, pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = label(pairs, aCol, bCol)
      .join(df.select(col(idCol).cast("long").as("id"), col(rankCol).as("_r")),
        "id")
    val w = Window.partitionBy("component")
      .orderBy(col("_r").desc, col("id").asc)
    val doomed = ranked.withColumn("_rn", row_number().over(w))
      .where(col("_rn") > 1)
      .select(col("id").as(idCol))
    df.join(doomed, Seq(idCol), "left_anti")
  }

  /** Dedup impact report — the DRY RUN every curation decision wants
    * before paying for [[dropNearDuplicates]]: per slice of `groupCol`,
    * what min-id keep-one WOULD remove (doc count, whitespace tokens,
    * chars) next to the slice's totals. Run it on the pair output first;
    * if a slice loses 40% of its tokens, that is a data-sourcing
    * conversation, not a dedup parameter.
    *
    * Scale shape: the doomed set is bounded by the duplicate population
    * (the component label table), joined back to the corpus by id —
    * corpus rows contribute one narrow projection (group, tokens, chars,
    * doomed flag via the id join), then ONE slice-bounded groupBy. Token
    * counting follows [[graft.pipeline.Profile.dataCard]]'s convention
    * (trim = '' → 0), and so does the hash-robustness rule — every
    * column is integral: the loss fraction ships as `token_loss_bp`,
    * exact basis points via BIGINT integral division (tokens_removed ×
    * 10⁴ div total_tokens — both engines truncate nonnegative integer
    * division identically; a rounded double quotient would be hostage to
    * each engine's last-ulp canonicalization). */
  def impactReport(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    import graft.functions.GraftFunctions
    val doomed = label(pairs, aCol, bCol)
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol), lit(true).as("_doomed"))
    val nTok = GraftFunctions.bind(trim(col(textCol))) { t =>
      when(t === "", lit(0)).otherwise(size(split(t, "\\s+")))
    }.cast("long")
    df.select(col(idCol), col(groupCol), nTok.as("_nt"),
        length(col(textCol)).cast("long").as("_nc"))
      .join(doomed, Seq(idCol), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_doomed"), 1L).otherwise(0L)).as("n_removed"),
        sum(col("_nt")).as("total_tokens"),
        sum(when(col("_doomed"), col("_nt")).otherwise(0L)).as("tokens_removed"),
        sum(when(col("_doomed"), col("_nc")).otherwise(0L)).as("chars_removed"))
      .withColumn("token_loss_bp",
        expr("(tokens_removed * 10000L) div greatest(total_tokens, 1L)"))
      .orderBy(col(groupCol))
  }
}
