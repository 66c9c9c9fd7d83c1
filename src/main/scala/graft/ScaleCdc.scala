package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * CDC streaming ingest at the 200k × 64-shard scale point (round 13):
 * [[graft.streaming.StreamingIngest.streamingRoutedCdc]] claims a live
 * routed index can absorb a mixed insert+delete change stream at LSM-tier
 * cost — this main measures that against the only alternative a frozen
 * index has (rebuild per batch).
 *
 * Shape: the index starts at 200k rows; five micro-batches each carry
 * 10k in-distribution inserts + 2k stride-spread deletes (the worst case
 * for compaction locality) through a MemoryStream. Recorded per batch:
 * wall, the LSM tiers taken, and after the drain: exhaustive-probe
 * survivor correctness (no tombstoned id surfaces; a resurrected id
 * does) and Recall@50 at the probes=8 operating point vs exact ground
 * truth over the net survivors. Control: one fresh build over the final
 * net rows — what EVERY batch would cost if CDC invalidated whole.
 *
 * Usage: runMain graft.ScaleCdc [pq] [nCorpus] (default f32 storage,
 * 200000 rows; `pq` runs the same stream against a pq(m=8,ksub=256)
 * index with recall measured through the served rescore)
 */
object ScaleCdc {

  private val K = 50
  private val NQueries = 100
  private val Dim = 64
  private val Shards = 64
  private val Probes = 8
  private val Batches = 5
  private val InsPerBatch = 10000L
  private val DelPerBatch = 2000L

  def main(args: Array[String]): Unit = {
    // `pq` mode (round 15): the same mixed change stream against a
    // PRODUCT-QUANTIZED routed index — appends overlay float tails,
    // compactions carry codes verbatim and encode folded tails under the
    // carried book, recall is measured through the served rescore.
    // `opq` mode (round 16): identical protocol with the learned-rotation
    // storage — folded tails rotate-then-encode under the carried
    // rotation + book (usage: runMain graft.ScaleCdc [pq|opq] [nCorpus])
    val mode = args.headOption.filter(Set("pq", "opq")).getOrElse("")
    val n = (if (mode.nonEmpty) args.drop(1) else args).headOption
      .map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

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
    val storageSpec: graft.ann.StorageSpec = mode match {
      case "pq" => graft.ann.StorageSpec.Pq(8, 256)
      case "opq" => graft.ann.StorageSpec.Opq(8, 256) // round 16: rotated codes through the same tiers
      case _ => graft.ann.StorageSpec.F32
    }
    val (index, buildWall) = timed(s"routed build ($Shards shards, " +
      s"storage=${storageSpec.key}) — the per-batch cost if CDC " +
      "invalidated whole") {
      graft.ann.RoutedAnnIndex.build(corpus, Dim, cfg, Shards, iters = 3,
        storage = storageSpec)
    }

    // five CDC batches: inserts continue the manifold past n; deletes are
    // a stride across the ORIGINAL corpus (spread over all shards)
    val delStride = n / (Batches * DelPerBatch)
    def batchOps(b: Int): Seq[(Long, Option[Seq[Float]], String, Long)] = {
      val ins = (0L until InsPerBatch).map { j =>
        val id = n + b * InsPerBatch + j
        (id, Some(gen(id).toSeq), "insert", 1L)
      }
      val del = (0L until DelPerBatch).map { j =>
        val id = (b * DelPerBatch + j) * delStride
        (id, None: Option[Seq[Float]], "delete", 1L)
      }
      ins ++ del
    }

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Option[Seq[Float]], String, Long)]
    val src = mem.toDF().select(col("_1").as("id"), col("_2").as("key"),
      col("_3").as("op"), col("_4").as("seq"))
    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    val (handle, q) = graft.streaming.StreamingIngest.streamingRoutedCdc(
      index, src, "id", "key", "op", seqCol = Some("seq"))
    val batchWalls = scala.collection.mutable.ArrayBuffer[Double]()
    try {
      for (b <- 0 until Batches) {
        val (_, w) = timed(s"CDC batch ${b + 1}/$Batches " +
          s"(${InsPerBatch} ins + ${DelPerBatch} del)") {
          mem.addData(batchOps(b): _*)
          q.processAllAvailable()
        }
        batchWalls += w
        println(s"    tiers so far: append=${handle.appendCount} " +
          s"compact=${handle.compactCount} tombstone=${handle.tombstoneCount} " +
          s"recluster=${handle.reclusterCount}")
      }
    } finally q.stop()
    val idx = handle.current

    // net state: n + 5*10k inserts, 5*2k deletes
    val deadIds = (0 until Batches).flatMap(b => (0L until DelPerBatch).map(
      j => (b * DelPerBatch + j) * delStride)).toSet
    val netRows = n + Batches * InsPerBatch - deadIds.size
    println(s"net live rows: $netRows (dead ${deadIds.size})")

    val queries = (0 until NQueries).map(i => gen(10000000L + i))
    // correctness at exhaustive probes: no dead id surfaces
    queries.take(10).foreach { v =>
      val got = idx.search(v, K, idx.numShards).map(_._1).toSet
      assert((got & deadIds).isEmpty, "tombstoned id surfaced")
    }
    // Recall@50 at the probes=8 operating point vs exact net ground truth
    val liveDf = corpus.where(!col("id").isin(deadIds.toSeq: _*))
      .union(spark.range(n, n + Batches * InsPerBatch)
        .map(i => (i, gen(i).toSeq)).toDF("id", "key")
        .select(col("id"), col("key").cast("array<float>").as("key")))
    val qdf = queries.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("qid", "qv")
      .select(col("qid"), col("qv").cast("array<float>").as("qv"))
    val gt = graft.dedup.Dedup.topKJoin(qdf, liveDf, "qid", "qv", "id", "key", K)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).map { case (qq, rs) => qq -> rs.map(_.getLong(1)).toSet }
    // quantized storage serves through the exact rescore: over-fetch the
    // storage's slack and re-rank with true vectors (gen(id) IS the true
    // vector for any live id) — the engine-hydration emulation
    val slackN = idx.storage.rescoreSlack
    val rec = queries.zipWithIndex.map { case (v, i) =>
      val raw = idx.search(v, K + slackN, Probes)
      val got =
        if (slackN == 0) raw.map(_._1).toSet
        else raw.map { case (id, _) =>
          (id, graft.functions.Similarity.jvm.cosine(v, gen(id)))
        }.sortBy { case (id, c) => (-c, id) }.take(K).map(_._1).toSet
      (gt(i.toLong) & got).size.toDouble / gt(i.toLong).size
    }
    val recall = rec.sum / rec.length

    val (_, control) = timed("rebuild control (one fresh build over net rows)") {
      val fresh = graft.ann.RoutedAnnIndex.build(liveDf, Dim, cfg, Shards,
        iters = 3, storage = storageSpec)
      fresh.unpersist()
    }

    println()
    println(f"| metric | value |")
    println(f"|---|---|")
    println(f"| initial build | $buildWall%.1f s |")
    println(f"| CDC batch walls | ${batchWalls.map(w => f"$w%.1f").mkString(" / ")} s |")
    println(f"| CDC total (5 batches) | ${batchWalls.sum}%.1f s |")
    println(f"| tiers | append=${handle.appendCount} compact=${handle.compactCount} " +
      s"tombstone=${handle.tombstoneCount} recluster=${handle.reclusterCount} |")
    println(f"| rebuild-per-batch control | $control%.1f s x $Batches = ${control * Batches}%.1f s |")
    println(f"| survivor Recall@$K @ probes=$Probes/$Shards | $recall%.4f |")
    spark.stop()
  }
}
