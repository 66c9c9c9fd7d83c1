package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Routed batch-kNN-join QUERY-SIDE scaling (VERDICT r12 #4): the round-12
 * datapoint for [[graft.ann.RoutedAnnIndex.topKJoin]] was 1 000 queries ×
 * 200k corpus; each shard task materializes its routed query slice as an
 * in-memory array (`RoutedAnnIndex.topKJoin`'s zipPartitions), so the
 * open question is whether the query side scales to 10k and 100k rows —
 * and what the per-task memory envelope actually is.
 *
 * Measures, on the organic SIFT-shaped 200k × 64-d corpus
 * ([[ScaleRecall.SiftGen]], the same geometry as the round-12 table):
 *  - routed topKJoin wall at probes = 16/64 (the ~0.99-recall operating
 *    point from SCALE.md) for 1k / 10k / 100k query rows;
 *  - the per-shard routed query load (max and mean rows landing on one
 *    shard partition, computed from the same centroid ranking the join
 *    uses) → bytes of the per-task query array (8 B id + 64×4 B vector);
 *  - IVF topKJoin at nProbe = 32/256 (its matched-recall point) on the
 *    same query frames;
 *  - the exact broadcast join ([[graft.dedup.Dedup.topKJoin]]) where it
 *    is affordable (1k / 10k; at 100k × 200k the broadcast arm is the
 *    documented wrong tool — included once for the record).
 *
 * Prints one markdown table; numbers land in SCALE.md.
 * Usage: runMain graft.ScaleJoin [nCorpus] (default 200000)
 */
object ScaleJoin {

  private val K = 50
  private val Dim = 64
  private val Shards = 64
  private val Probes = 16
  private val Cells = 256
  private val NProbe = 32

  def main(args: Array[String]): Unit = {
    val filtered = args.headOption.contains("filtered")
    val n = (if (filtered) args.drop(1) else args).headOption
      .map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (filtered) { filteredJoin(spark, n); spark.stop(); return }
    import spark.implicits._

    val gen = new ScaleRecall.SiftGen(seed = 4242L, dim = Dim, intrinsic = 12)
    val corpus = spark.range(n).map(i => (i, gen(i).toSeq)).toDF("id", "key")
      .select(col("id"), col("key").cast("array<float>").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus ${corpus.count()} x $Dim (organic SIFT-shaped)")

    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label: $s%.1f s")
      (r, s)
    }

    val cfg = graft.types.NonLinearConfig.HNSWConfig(efConstruction = 100,
      maximumConnections = 40, maximumConnectionsZero = 80, efSearch = 128,
      metric = graft.types.Algorithm.CosineSimilarity)
    val (routed, _) = timed(s"routed build ($Shards shards)") {
      graft.ann.RoutedAnnIndex.build(corpus, Dim, cfg, Shards, iters = 3)
    }
    val (ivf, _) = timed(s"ivf build ($Cells cells)") {
      graft.ann.IvfIndex.build(corpus, nCells = Cells, iters = 2,
        metric = graft.types.Algorithm.CosineSimilarity)
    }

    val rows = scala.collection.mutable.ArrayBuffer[String]()
    for (nq <- Seq(1000L, 10000L, 100000L)) {
      println(s"---- $nq queries ----")
      val queries = spark.range(nq)
        .map(i => (10000000L + i, gen(20000000L + i).toSeq)).toDF("qid", "qv")
        .select(col("qid"), col("qv").cast("array<float>").as("qv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      queries.count()

      // per-task query-array envelope: the same centroid ranking the join
      // runs, aggregated per target shard (driver-side — nq × Shards
      // distance evals, trivial)
      val qvecs = queries.select("qv").as[Seq[Float]].collect().map(_.toArray)
      val perShard = new Array[Long](Shards)
      qvecs.foreach(q => routed.probeShards(q, Probes).foreach(s => perShard(s) += 1))
      val maxRows = perShard.max
      val meanRows = perShard.sum.toDouble / Shards
      val bytesPerRow = 8 + Dim * 4
      println(f"  routed query slices: mean $meanRows%.0f rows/shard, max " +
        f"$maxRows rows/shard (${maxRows * bytesPerRow / 1024.0 / 1024.0}%.1f MiB/task)")

      val (_, wRouted) = timed(s"routed topKJoin probes=$Probes/$Shards") {
        routed.topKJoin(queries, "qid", "qv", K, Probes)
          .queryExecution.toRdd.count()
      }
      // comparison arms are capped at 10k queries for matched-work
      // honesty, not feasibility: post-BoundedTopK (round 13) both are
      // scan-bound streams with no sort and no spill, but their SCORED
      // PAIR counts at 100k (2.5 B for IVF's probed cells, 20 B for the
      // broadcast product) are the shapes' intrinsic cost — the routed
      // arm exists precisely because its matched work is |q|·probes GRAPH
      // SEARCHES instead. (The window-sort formulation this harness
      // originally measured cliffed 22× at 10× queries on the IVF arm and
      // spilled a 65 GB disk on the 10k exact arm; both fixed by
      // graft.ann.BoundedTopK — the before/after table is in SCALE.md.)
      val wIvf =
        if (nq > 10000L) Double.NaN
        else timed(s"ivf topKJoin nProbe=$NProbe/$Cells") {
          ivf.topKJoin(queries, "qid", "qv", K, NProbe)
            .queryExecution.toRdd.count()
        }._2
      val wExact =
        if (nq > 10000L) Double.NaN
        else timed("exact broadcast join") {
          graft.dedup.Dedup.topKJoin(queries, corpus, "qid", "qv", "id",
            "key", K).queryExecution.toRdd.count()
        }._2
      def cell(w: Double) = if (w.isNaN) "skipped (matched-work cap)" else f"$w%.1f s"
      rows += f"| ${nq}%,d | $wRouted%.1f s (max $maxRows rows = " +
        f"${maxRows * bytesPerRow / 1024.0 / 1024.0}%.1f MiB/task) | ${cell(wIvf)} | ${cell(wExact)} |"
      println(rows.last)
      queries.unpersist(blocking = false)
    }

    println()
    println(s"| queries x ${n / 1000}k corpus | routed topKJoin p=$Probes/$Shards (per-task query array) | IVF nProbe=$NProbe/$Cells | exact broadcast |")
    println("|---|---|---|---|")
    rows.foreach(println)
    spark.stop()
  }

  /** FILTERED routed batch join (VERDICT r13 #4's selectivity datapoint):
    * the accept filter — a Bloom sketch of a predicate slice, the engine
    * arm's sketch — threads into every shard's graph search. Measures,
    * per selectivity f ∈ {50%, 10%, 1%} at 200k × 64 and 1k queries:
    * the filtered routed join wall (exhaustive probes + slack +
    * driver-free exact post-verify via an ids anti-join), recall@10 of
    * the verified result vs exact filtered ground truth, and the
    * filtered BRUTE-FORCE control (exact join over the pre-filtered
    * corpus — the path a filtered composition had to take before the
    * filter threaded through).
    *
    * The expected shape: in-graph filtering prunes RESULTS, not
    * traversal, so the join wall is ~flat in f while the brute-force
    * control shrinks with f — the crossover (very selective filters
    * favor scanning the tiny slice) is exactly AnnSearch's ≤4096
    * brute-force cutover, which the engine already takes driver-side.
    * Round 15 adds the AUTO arm: the same pruned-probe request with the
    * filter's cardinality attached ([[graft.ann.IdFilter.Bloom]]
    * `expected`) — sharp slices cut over to the exact in-shard slice
    * scan ([[graft.ann.RoutedAnnIndex.FilteredScanFraction]]), broad
    * ones honor the caller's probes; the table shows the auto choice
    * against both fixed arms at every selectivity.
    *
    * Usage: runMain graft.ScaleJoin filtered [nCorpus] */
  private def filteredJoin(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val k = 10
    val nq = 1000
    val gen = new ScaleRecall.SiftGen(seed = 4242L, dim = Dim, intrinsic = 12)
    val corpus = spark.range(n).map(i => (i, gen(i).toSeq)).toDF("id", "key")
      .select(col("id"), col("key").cast("array<float>").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus ${corpus.count()} x $Dim (organic SIFT-shaped), $nq queries")
    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label: $s%.1f s")
      (r, s)
    }
    val cfg = graft.types.NonLinearConfig.HNSWConfig(efConstruction = 100,
      maximumConnections = 40, maximumConnectionsZero = 80, efSearch = 128,
      metric = graft.types.Algorithm.CosineSimilarity)
    val (idx, _) = timed(s"routed build ($Shards shards)") {
      graft.ann.RoutedAnnIndex.build(corpus, Dim, cfg, Shards, iters = 3)
    }
    val queries = spark.range(nq)
      .map(i => (i, gen(10000000L + i).toSeq)).toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()
    val rows = scala.collection.mutable.ArrayBuffer[String]()
    for (den <- Seq(2L, 10L, 100L)) {
      // the slice: id % den == 0 (spread across shards — selectivity
      // without locality, the hard case for probe routing)
      val accepted = corpus.where(col("id") % den === 0).select("id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnt = accepted.count()
      val bloom = accepted.stat.bloomFilter("id", cnt, 0.001)
      val slack = graft.ann.AnnSearch.FalsePositiveSlack
      def joinAt(probes: Int, expected: Long = -1L) = {
        val joined = idx.topKJoin(queries, "qid", "qv", k + slack,
          probes = probes, filter = graft.ann.IdFilter.Bloom(bloom, expected))
        // exact post-verify + re-rank by the pre-verify order
        val v = joined
          .join(accepted.withColumnRenamed("id", "cid"), Seq("cid"), "left_semi")
          .select(col("qid"), col("cid"), (-col("rank")).cast("double").as("_s"))
        graft.ann.BoundedTopK.topK(v, "qid", "cid", "_s", k)
          .select("qid", "cid", "rank").collect()
      }
      val (verified, wJoin) = timed(f"filtered routed join p=$Shards (1/$den)") {
        joinAt(Shards)
      }
      val (verified8, wJoin8) = timed(f"filtered routed join p=8 (1/$den)") {
        joinAt(8)
      }
      // AUTO arm (round 15): same pruned-probes request, but the filter
      // carries its known cardinality — sharp slices cut over to the
      // exact slice scan (FilteredScanFraction), broad ones keep the
      // caller's graph probes
      val autoArm =
        if (cnt <= graft.ann.RoutedAnnIndex.FilteredScanFraction *
            idx.storedRows) "scan" else "graph"
      val (verifiedAuto, wAuto) = timed(
        f"AUTO routed join p=8 + cardinality (1/$den, arm=$autoArm)") {
        joinAt(8, expected = cnt)
      }
      // exact filtered ground truth — and the brute-force CONTROL wall
      val slice = corpus.join(accepted.withColumnRenamed("id", "_a"),
        col("id") === col("_a"), "left_semi")
      val (gtRows, wBrute) = timed(f"brute-force filtered control (1/$den)") {
        graft.dedup.Dedup.topKJoin(queries, slice, "qid", "qv", "id", "key", k)
          .select("qid", "cid").collect()
      }
      val gt = gtRows.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      def recallOf(res: Array[org.apache.spark.sql.Row]): Double = {
        val got = res.groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
        (0 until nq).map { i =>
          val t = gt.getOrElse(i.toLong, Set.empty)
          if (t.isEmpty) 1.0
          else (t & got.getOrElse(i.toLong, Set.empty)).size.toDouble / t.size
        }.sum / nq
      }
      rows += f"| 1/$den (${cnt}%,d rows) | $wJoin%.1f s / ${recallOf(verified)}%.4f " +
        f"| $wJoin8%.1f s / ${recallOf(verified8)}%.4f " +
        f"| $wAuto%.1f s / ${recallOf(verifiedAuto)}%.4f ($autoArm) " +
        f"| $wBrute%.1f s |"
      println(rows.last)
      accepted.unpersist(blocking = false)
    }
    println()
    println(s"| selectivity | routed p=$Shards (wall / recall@$k) | routed p=8 (wall / recall@$k) | AUTO p=8+cardinality (wall / recall@$k / arm) | brute-force filtered control |")
    println("|---|---|---|---|---|")
    rows.foreach(println)
    idx.unpersist(); queries.unpersist(); corpus.unpersist()
  }
}
