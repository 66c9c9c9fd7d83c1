package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.types.{Algorithm, NonLinearConfig}

/**
 * Routed-index FRESHNESS under append-only growth (VERDICT r11 #5): the
 * routed HNSW's maintenance story is periodic reclustering
 * ([[graft.ann.RoutedAnnIndex]] scaladoc) — this main quantifies the
 * cadence by measuring how much recall a FROZEN-centroid index loses as
 * appended data accumulates, versus a full recluster over the same rows.
 *
 * Two append regimes, because they bound the real answer from both sides:
 *
 *  - IN-DISTRIBUTION: appended rows come from the same generator manifold
 *    as the base corpus. Frozen centroids remain a correct quantizer of
 *    the data — decay should be ~zero at any appended fraction, which
 *    pins that the cadence is NOT about volume.
 *  - DRIFTED: appended rows come from a different manifold (fresh basis —
 *    a new domain entering the corpus). Frozen centroids mis-route the
 *    new region — this is the regime that forces a recluster, and the
 *    measured decay-vs-fraction curve is the trigger rule.
 *
 * Protocol per (regime, appended fraction f): corpus = base(N) ∪
 * append(f·N); queries = 100 held-out vectors, half from each manifold in
 * the drifted regime (the new domain's queries are exactly the ones a
 * stale quantizer fails); ground truth = exact cosine top-K over the
 * union ([[graft.dedup.Dedup.topKJoin]], independent code path); compare
 * Recall@50 at fixed probes of (a) shards REBUILT against the
 * BASE-trained frozen centroids — the append-without-recluster shape,
 * (b) the SHIPPED overlay-append path ([[graft.ann.RoutedAnnIndex.append]]
 * with guards widened — this arm measures exactly the configurations the
 * production guards exist to refuse), and (c) a fully reclustered index
 * (control). Prints one markdown table; numbers land in SCALE.md.
 *
 * Usage: SPARK_GRAFT_STALE_N=200000 runMain graft.ScaleStaleness
 */
object ScaleStaleness {

  private val K = 50
  private val NQueries = 100
  private val Dim = 64

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = sys.env.getOrElse("SPARK_GRAFT_STALE_N", "200000").toLong
    val nShards = sys.env.getOrElse("SPARK_GRAFT_STALE_SHARDS", "64").toInt
    val probes = sys.env.getOrElse("SPARK_GRAFT_STALE_PROBES", "8").toInt
    val cfg = NonLinearConfig.HNSWConfig(efConstruction = 100,
      maximumConnections = 40, maximumConnectionsZero = 80,
      efSearch = 16, metric = Algorithm.CosineSimilarity)

    // base manifold (the ScaleRecall organic geometry) and a drifted one:
    // same generator family, different basis seed = a new domain whose
    // vectors live on a DIFFERENT low-dimensional manifold
    val baseGen = new ScaleRecall.SiftGen(seed = 4242L, dim = Dim, intrinsic = 12)
    val driftGen = new ScaleRecall.SiftGen(seed = 9999L, dim = Dim, intrinsic = 12)

    def corpus(gen: ScaleRecall.SiftGen, from: Long, count: Long): DataFrame =
      spark.range(from, from + count).map(i => (i, gen(i).toSeq))
        .toDF("id", "key")
        .select(col("id"), col("key").cast("array<float>").as("key"))

    val base = corpus(baseGen, 0L, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    println(s"base corpus $n x $Dim, $nShards shards, probes=$probes, K=$K")

    // frozen centroids: trained ONCE on the base corpus (3 Lloyd rounds,
    // the ScaleRecall build config) — every "stale" index reuses these
    val frozen = graft.ann.IvfIndex.trainCentroids(base, nShards, iters = 3)

    def timed[A](what: String)(f: => A): A = {
      val t = System.nanoTime()
      val r = f
      println(f"  [$what done in ${(System.nanoTime() - t) / 1e9}%.1f s]")
      r
    }

    // held-out queries: ids beyond any corpus range. In the drifted regime
    // half probe the base manifold, half the new domain.
    def queryVecs(drifted: Boolean): Seq[(Long, Array[Float])] = {
      val qBase = (0 until (if (drifted) NQueries / 2 else NQueries))
        .map(i => (10_000_000L + i, baseGen(10_000_000L + i)))
      val qDrift = if (!drifted) Seq.empty else
        (0 until NQueries / 2).map(i => (20_000_000L + i, driftGen(20_000_000L + i)))
      qBase ++ qDrift
    }

    val rows = scala.collection.mutable.ArrayBuffer[String]()
    rows += ("| regime | appended | frozen shard-rebuild (stale) | " +
      "overlay append (shipped path) | reclustered (control) |")
    rows += "|---|---|---|---|---|"

    for (regime <- Seq("in-dist", "drifted");
         frac <- Seq(0.0, 0.1, 0.25, 0.5)) {
      if (!(regime == "drifted" && frac == 0.0)) {
        val appended = (n * frac).toLong
        val gen = if (regime == "drifted") driftGen else baseGen
        val union = (if (appended == 0) base
          else base.union(corpus(gen, 1_000_000L + 0, appended)
            .select(col("id") + lit(1_000_000L), col("key"))
            .toDF("id", "key")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        union.count()
        val qs = queryVecs(regime == "drifted")
        val qdf = qs.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qv")
          .select(col("qid"), col("qv").cast("array<float>").as("qv"))
        val gt = timed(s"$regime f=$frac ground truth") {
          graft.dedup.Dedup.topKJoin(qdf, union, "qid", "qv", "id", "key", K)
            .select("qid", "cid").collect()
            .groupBy(_.getLong(0))
            .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
        }
        def recallOf(idx: graft.ann.RoutedAnnIndex): Double = {
          val per = qs.map { case (q, v) =>
            val got = idx.search(v, K, probes).map(_._1).toSet
            (gt(q) & got).size.toDouble / gt(q).size }
          per.sum / per.length
        }
        val stale = timed(s"$regime f=$frac stale build") {
          graft.ann.RoutedAnnIndex.build(union, Dim, cfg, nShards,
            iters = 3, replicationEps = 0.0, maxReplicas = 2,
            storage = graft.ann.StorageSpec.F32, frozenCentroids = Some(frozen))
        }
        val rStale = recallOf(stale)
        stale.unpersist()
        // the SHIPPED append path: exact brute-force overlay tails on the
        // frozen-centroid base (guards widened — this arm MEASURES the
        // configurations the production guards exist to refuse)
        val rOverlay = if (appended == 0) rStale else {
          val baseIdx = graft.ann.RoutedAnnIndex.build(base, Dim, cfg,
            nShards, iters = 3, replicationEps = 0.0, maxReplicas = 2,
            storage = graft.ann.StorageSpec.F32, frozenCentroids = Some(frozen))
          val t0 = System.nanoTime()
          val ov = baseIdx.append(
            corpus(gen, 1_000_000L, appended)
              .select((col("id") + lit(1_000_000L)).as("id"), col("key")),
            driftLimit = Double.MaxValue, patchLimit = Double.MaxValue).get
          println(f"  [$regime f=$frac overlay append took ${(System.nanoTime() - t0) / 1e9}%.1f s]")
          val r = recallOf(ov)
          ov.unpersist()
          r
        }
        val rFresh = if (frac == 0.0) rStale else {
          val fresh = timed(s"$regime f=$frac recluster build") {
            graft.ann.RoutedAnnIndex.build(union, Dim, cfg, nShards, iters = 3)
          }
          val r = recallOf(fresh)
          fresh.unpersist()
          r
        }
        rows += f"| $regime | ${(frac * 100).toInt}%% | $rStale%.4f | $rOverlay%.4f | $rFresh%.4f |"
        println(rows.last)
        if (union ne base) union.unpersist(blocking = false)
      }
    }

    println()
    rows.foreach(println)
    spark.stop()
  }
}
