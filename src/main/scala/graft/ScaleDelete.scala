package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Routed-index DELETE maintenance cost (VERDICT r12 #1): before round 13,
 * DelKey/DelPred/Upsert invalidated an `hnsw_routed` index WHOLE and the
 * next search paid a full recluster — one deleted row costing a
 * full-corpus Lloyd + rebuild. [[graft.ann.RoutedAnnIndex.delete]] now
 * absorbs deletes LSM-style (tombstone tier → guarded local compaction);
 * this main measures what that buys at the 200k × 64-shard scale point,
 * mirroring the append-side staleness table:
 *
 *  - TOMBSTONE tier (1k and 10k deleted = 0.5% / 5% < the 10% guard):
 *    delete wall (should be ≈ 0 — a driver-side set merge), search wall
 *    with the tombstone filter active, and survivor Recall@50 vs exact
 *    ground truth over the survivors;
 *  - COMPACTION tier (40k = 20% > the guard): delete wall (local
 *    per-shard rebuilds of only the shards holding deleted rows) and
 *    survivor recall;
 *  - RECLUSTER control: a fresh build over the survivors — what every
 *    delete used to cost.
 *
 * Prints one markdown table; numbers land in SCALE.md.
 * Usage: runMain graft.ScaleDelete [nCorpus] (default 200000)
 */
object ScaleDelete {

  private val K = 50
  private val NQueries = 100
  private val Dim = 64
  private val Shards = 64
  private val Probes = 8

  def main(args: Array[String]): Unit = {
    val cliff = args.headOption.contains("cliff")
    val n = (if (cliff) args.drop(1) else args).headOption
      .map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (cliff) { delPredCliff(spark, n); spark.stop(); return }
    import spark.implicits._

    val gen = new ScaleRecall.SiftGen(seed = 4242L, dim = Dim, intrinsic = 12)
    val corpus = spark.range(n).map(i => (i, gen(i).toSeq)).toDF("id", "key")
      .select(col("id"), col("key").cast("array<float>").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus ${corpus.count()} x $Dim (organic SIFT-shaped)")
    val queries = (0 until NQueries).map(i => gen(10000000L + i))

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
    val (index, buildWall) = timed(s"routed build ($Shards shards) — " +
      "the old per-delete cost") {
      graft.ann.RoutedAnnIndex.build(corpus, Dim, cfg, Shards, iters = 3)
    }

    // deleted ids are a deterministic stride — spread across shards, the
    // worst case for compaction locality (every shard holds victims)
    def victims(k: Long): Seq[Long] = {
      val stride = math.max(1L, n / k)
      (0L until n by stride).take(k.toInt)
    }

    def searchWall(idx: graft.ann.RoutedAnnIndex): Double = {
      val t0 = System.nanoTime()
      queries.foreach(q => idx.search(q, K, Probes))
      (System.nanoTime() - t0) / 1e9
    }

    def survivorRecall(idx: graft.ann.RoutedAnnIndex, dead: Set[Long]): Double = {
      val qdf = queries.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("qid", "qv")
        .select(col("qid"), col("qv").cast("array<float>").as("qv"))
      val live = corpus.where(!col("id").isin(dead.toSeq: _*))
      val gt = graft.dedup.Dedup.topKJoin(qdf, live, "qid", "qv", "id", "key", K)
        .select("qid", "cid").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val per = queries.zipWithIndex.map { case (v, i) =>
        val got = idx.search(v, K, Probes).map(_._1).toSet
        assert((got & dead).isEmpty, "deleted id surfaced")
        (gt(i.toLong) & got).size.toDouble / gt(i.toLong).size
      }
      per.sum / per.length
    }

    val baseSearch = searchWall(index)
    println(f"baseline: build $buildWall%.1f s, $NQueries searches $baseSearch%.1f s")
    val rows = scala.collection.mutable.ArrayBuffer[String]()

    for (k <- Seq(1000L, 10000L, 40000L)) {
      val dead = victims(k)
      val (out, delWall) = timed(s"delete ${k} ids") { index.delete(dead) }
      val sw = searchWall(out.index)
      val rec = survivorRecall(out.index, dead.toSet)
      val (_, reclusterWall) = timed(s"recluster control (survivors of $k)") {
        val fresh = graft.ann.RoutedAnnIndex.build(
          corpus.where(!col("id").isin(dead: _*)), Dim, cfg, Shards, iters = 3)
        fresh.unpersist()
      }
      rows += f"| $k%,d (${k * 100.0 / n}%.1f%%) | ${out.tier} | $delWall%.2f s | " +
        f"$sw%.1f s (base $baseSearch%.1f) | $rec%.4f | $reclusterWall%.1f s |"
      println(rows.last)
      if (out.tier == "compact") out.index.unpersist()
      // tombstone-tier outcomes share the base index's shards — no unpersist
    }

    println()
    println("| deleted | tier | delete wall | 100-search wall | survivor Recall@50 | recluster control |")
    println("|---|---|---|---|---|---|")
    rows.foreach(println)
    spark.stop()
  }

  /** ENGINE-level DelPred past [[graft.engine.GraftEngine.RoutedDeleteCap]]
    * (VERDICT r13 #8): a predicate delete matching more rows than the cap
    * can't name its ids for the tombstone tier — the routed index
    * invalidates WHOLE and the NEXT routed search pays a lazy recluster
    * (GraftEngine.ensureRoutedIndex). This arm measures that first-search
    * latency cliff against the steady-state search, and against the
    * in-cap tombstone path, so the tradeoff (eager recluster under the
    * mutation lock vs lazy on first read) is a number, not folklore.
    * Correctness of the path is pinned in RoutedEngineSpec (cap
    * overridden via spark.graft.routedDeleteCap).
    *
    * Usage: runMain graft.ScaleDelete cliff [nCorpus] */
  private def delPredCliff(spark: SparkSession, n: Long): Unit = {
    import spark.implicits._
    val gen = new ScaleRecall.SiftGen(seed = 4242L, dim = Dim, intrinsic = 12)
    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label: $s%.1f s")
      (r, s)
    }
    val e = new graft.engine.GraftEngine(spark)
    e.createStore("cliff", Dim, predicates = Set("bucket", "rare"))
    // bucket: thirds (one bucket ≈ n/3 >> the 65536 cap at n = 200k);
    // rare: ~0.5% (safely inside the cap — the tombstone-tier control)
    val entries = spark.range(n).map { i =>
      (gen(i).toSeq, i % 3, if (i % 200 == 0) "y" else "n")
    }.toDF("key", "b", "r").select(
      col("key").cast("array<float>").as("key"),
      map(
        lit("bucket"), struct(lit("raw_string").as("kind"),
          col("b").cast("string").as("str"), lit(null).cast("binary").as("bin")),
        lit("rare"), struct(lit("raw_string").as("kind"),
          col("r").as("str"), lit(null).cast("binary").as("bin"))).as("value"))
    val (_, setWall) = timed(s"engine Set ($n rows)") {
      e.set("cliff", entries, "public")
    }
    e.createNonLinearIndex("cliff", Seq(
      graft.types.NonLinearConfig.RoutedHNSWConfig(
        hnsw = graft.types.NonLinearConfig.HNSWConfig(efConstruction = 100,
          maximumConnections = 40, maximumConnectionsZero = 80, efSearch = 128,
          metric = graft.types.Algorithm.CosineSimilarity),
        numShards = Shards, probes = Probes)))
    val q = gen(10000000L)
    def search(label: String): Double =
      timed(label) { e.getSimN("cliff", q, K, graft.types.Algorithm.HNSW).count() }._2
    val firstBuild = search("first search (initial lazy index build)")
    val steady = search("steady-state search")
    // the CONTROL: an in-cap delete (≈ n/200 rows) keeps the index live
    import graft.types.PredicateCondition.Equals
    import graft.types.MetadataValue.RawString
    val (nRare, rareWall) = timed("DelPred (rare = y, in-cap)") {
      e.delPred("cliff", Equals("rare", RawString("y")))
    }
    val afterTombstone = search("search after in-cap DelPred (tombstone tier)")
    // the CLIFF: a third of the store — far past the cap
    val (nBig, bigWall) = timed("DelPred (bucket = 1, past-cap)") {
      e.delPred("cliff", Equals("bucket", RawString("1")))
    }
    val cliffSearch = search("FIRST search after past-cap DelPred (lazy recluster)")
    val after = search("second search (steady again)")
    println()
    println(f"engine Set wall: $setWall%.1f s; initial lazy build (first search): $firstBuild%.1f s")
    println("| event | rows | wall | following search |")
    println("|---|---|---|---|")
    println(f"| steady-state search | — | — | $steady%.2f s |")
    println(f"| in-cap DelPred (tombstone tier) | $nRare%,d | $rareWall%.2f s | $afterTombstone%.2f s |")
    println(f"| past-cap DelPred (whole invalidate) | $nBig%,d | $bigWall%.2f s | $cliffSearch%.1f s (THE CLIFF) |")
    println(f"| post-recluster search | — | — | $after%.2f s |")
  }
}
