package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming at the SCALE corpus (VERDICT r9 #5): the sf1 stress run
 * excluded every streaming path as harness-shaped — the bench streaming
 * queries replay MemoryStreams whose drivers collect the corpus first, so
 * nothing said what the STATEFUL operators do at 1M events / 100k docs.
 * This main drives them from a FILE SOURCE instead (the production
 * arrival shape): the scaled tables are re-written as time-ordered chunk
 * files into a landing dir, `readStream` consumes them a few files per
 * trigger, and each query runs to completion while we record wall time,
 * micro-batch count, peak state-store rows/bytes, and the final
 * watermark — the numbers SCALE.md's streaming story was missing.
 *
 * Queries (the three stateful families):
 *  1. sessionize — flatMapGroupsWithState per user over 1M events
 *     ([[graft.streaming.StreamingIngest.sessionize]]); state is one
 *     entry per live user.
 *  2. windowed aggs — event-time tumbling windows with watermark
 *     ([[graft.streaming.StreamingIngest.windowedEventStats]]); state is
 *     open windows × event types.
 *  3. dedup-vs-index — each micro-batch of the 100k-doc stream slice
 *     probes the persisted 400k-doc MinHash index
 *     ([[graft.streaming.StreamingIngest.streamingDedupAgainstIndex]]);
 *     engine state lives in the index artifact, not the state store.
 *
 * Plus (r11 #7) the three round-10 stream ops, previously measured only
 * on MemoryStream replays at sf0.1:
 *  4. drift counts — windowed (K+1)-bucket token distribution over the
 *     100k-doc stream ([[graft.streaming.StreamingIngest
 *     .streamingDriftCounts]]); state is (K+1) × open windows, bounded
 *     regardless of stream vocabulary (the exact integer L1 finisher
 *     [[graft.streaming.StreamingIngest.driftFromCounts]] runs on the
 *     collected counts after the drain — driver-scale by construction).
 *  5. n-gram monitor — windowed counts of a fixed 3-gram watchlist over
 *     the same doc stream ([[graft.streaming.StreamingIngest
 *     .ngramMonitor]]); state is watchlist × open windows.
 *  6. streaming embedding card — per (window, label) algebraic vector
 *     profile over the 200k-vector stream ([[graft.streaming
 *     .StreamingIngest.streamingEmbeddingCard]]); state is one partial
 *     row per (window, label).
 *
 * Usage: SPARK_GRAFT_SF_DIR=<scale dir> runMain graft.ScaleStream
 */
object ScaleStream {

  /** Re-write `df` as `chunks` time-ordered part files in one flat dir:
    * sequential single-file appends so file mtimes ascend with event
    * time, which is the order FileStreamSource lists pre-existing files
    * in — the stream then arrives (approximately) in event-time order,
    * as a real ingestion feed would, and finite watermarks behave. */
  private def writeChunks(df: DataFrame, orderCol: String, chunks: Int,
      dir: String): Unit = {
    val b = df.select(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long")).head
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val width = math.max(1L, (hi - lo) / chunks + 1)
    val bucketed = df.withColumn("_b",
      ((col(orderCol).cast("long") - lo) / width).cast("int"))
    for (i <- 0 until chunks) {
      bucketed.where(col("_b") === i).drop("_b")
        .coalesce(1).write.mode("append").parquet(dir)
    }
  }

  private final case class QStats(name: String, seconds: Double,
      batches: Long, outRows: Long, peakStateRows: Long,
      peakStateBytes: Long)

  /** Run a started query to completion, harvesting progress metrics. */
  private def drain(name: String, q: StreamingQuery,
      outRows: () => Long): QStats = {
    val t0 = System.nanoTime()
    var batches = 0L
    var peakRows = 0L
    var peakBytes = 0L
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      batches += 1
      val so = p.stateOperators
      if (so.nonEmpty) {
        peakRows = math.max(peakRows, so.map(_.numRowsTotal).sum)
        peakBytes = math.max(peakBytes, so.map(_.memoryUsedBytes).sum)
      }
    }
    q.stop()
    QStats(name, (System.nanoTime() - t0) / 1e9, batches, outRows(),
      peakRows, peakBytes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // recentProgress must retain every micro-batch of the run for the
      // peak-state harvest (default keeps 100)
      .config("spark.sql.streaming.numRecentProgressUpdates", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("graft-scale-stream")
    def dir(s: String) = {
      val p = work.resolve(s); java.nio.file.Files.createDirectories(p); p.toString
    }

    // ---------- landing dirs (untimed prep; a real feed writes these) ----
    // eventsTable normalizes the ts physical type (NANOS-as-long or
    // TIMESTAMP_NTZ, depending on the writer) to a session-TZ TIMESTAMP
    val events = graft.queries.TestStores.eventsTable(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val eventsDir = dir("events_landing")
    writeChunks(events.withColumn("ts_us", unix_micros(col("ts"))),
      "ts_us", chunks = 40, dir = eventsDir)
    val evSchema = spark.read.parquet(eventsDir).schema
    val nEvents = spark.read.parquet(eventsDir).count()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // history = 80% of docs, indexed ONCE (the production split — identical
    // to the bench/TestStores slice rule); stream = the other 20%, with a
    // synthetic arrival time ordered by doc_id
    val history = docs.where(col("doc_id") % 5 =!= 0)
    val streamSlice = docs.where(col("doc_id") % 5 === 0)
      .withColumn("ts", timestamp_micros(col("doc_id") * 1000L))
    val docsDir = dir("docs_landing")
    writeChunks(streamSlice.withColumn("ts_us", unix_micros(col("ts"))),
      "ts_us", chunks = 20, dir = docsDir)
    val docSchema = spark.read.parquet(docsDir).schema
    val tIdx = System.nanoTime()
    val index = graft.dedup.IncrementalDedup.buildIndex(
      history, "doc_id", "text", dir("mh_index"), sourceStamp = sfDir)
    println(f"prep: $nEvents events in 40 chunks, " +
      f"${streamSlice.count()} stream docs in 20 chunks, " +
      f"400k-doc index built in ${(System.nanoTime() - tIdx) / 1e9}%.1f s")

    def fileStream(path: String, schema: org.apache.spark.sql.types.StructType,
        filesPerTrigger: Int): DataFrame =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger)
        .parquet(path)

    val stats = scala.collection.mutable.ArrayBuffer[QStats]()

    // ---------------- 1. sessionize (per-user custom state) ----------------
    {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val src = fileStream(eventsDir, evSchema, 2)
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.StreamingIngest.Event]
      val q = graft.streaming.StreamingIngest.sessionize(src, gapSeconds = 1800)
        .writeStream.outputMode("append")
        .option("checkpointLocation", dir("ck_sessionize"))
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            graft.streaming.StreamingIngest.Session], _: Long) =>
          acc.addAndGet(b.count()); () }
        .start()
      stats += drain("sessionize gap=30min", q, () => acc.get())
      println(stats.last)
      // context: the batch twin's total (streaming emits CLOSED sessions
      // only; each user's final open session stays in state)
      val batchSessions = graft.streaming.StreamingIngest
        .sessionizeBatch(events, 1800).count()
      println(s"  (batch twin: $batchSessions sessions incl. open tails)")
    }

    // ---------------- 2. windowed aggregation with watermark --------------
    {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val src = fileStream(eventsDir, evSchema, 2)
      val agg = graft.streaming.StreamingIngest.windowedEventStats(
        src, windowLength = "1 hour", watermark = Some("2 hours"))
      val q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", dir("ck_windows"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          acc.addAndGet(b.count()); () }
        .start()
      stats += drain("windowed aggs 1h/wm 2h", q, () => acc.get())
      println(stats.last)
    }

    // ---------------- 3. dedup-vs-index (stream probes history) -----------
    {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val src = fileStream(docsDir, docSchema, 2)
      val q = graft.streaming.StreamingIngest.streamingDedupAgainstIndex(
        index, src, "doc_id", "text", threshold = 0.8,
        checkpointDir = Some(dir("ck_dedup"))) { pairs =>
        acc.addAndGet(pairs.count()); ()
      }
      stats += drain("dedup-vs-index thr=0.8", q, () => acc.get())
      println(stats.last)
    }

    // ---------------- 4. drift counts (K+1 bucket distribution) -----------
    // doc event times are doc_id ms apart (≈ 8 min span at sf1), so windows
    // are 1 MINUTE: ~9 open windows × 4 buckets of state, and the watermark
    // actually closes windows mid-run
    {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val counts = scala.collection.mutable.ArrayBuffer[(java.sql.Timestamp, String, Long)]()
      val src = fileStream(docsDir, docSchema, 2)
      val agg = graft.streaming.StreamingIngest.streamingDriftCounts(
        src, "ts", "text", Seq("filter", "join", "table"), "1 minute",
        watermark = Some("2 minutes"))
      val q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", dir("ck_drift"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.collect() // (K+1) × closed windows — tiny
          acc.addAndGet(rows.length)
          counts.synchronized {
            counts ++= rows.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
          }
          () }
        .start()
      stats += drain("drift counts K=3 w=1min", q, () => acc.get())
      println(stats.last)
      // the exact-integer L1 finisher over the emitted counts (driver-scale)
      val drift = graft.streaming.StreamingIngest.driftFromCounts(
        counts.toSeq.toDF("window_start", "token", "n"),
        Map("table" -> 4L, "filter" -> 2L, "join" -> 1L), 64L)
        .orderBy("window_start").collect()
      println(s"  (finisher: ${drift.length} windows, l1_num/l1_den head = " +
        drift.headOption.map(r => s"${r.getLong(2)}/${r.getLong(3)}").getOrElse("-") + ")")
    }

    // ---------------- 5. n-gram monitor (fixed watchlist) ------------------
    {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val src = fileStream(docsDir, docSchema, 2)
      val agg = graft.streaming.StreamingIngest.ngramMonitor(
        src, "ts", "text", 2, Seq("table hash", "customer join", "big order"),
        "1 minute", watermark = Some("2 minutes"))
      val q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", dir("ck_ngram_mon"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          acc.addAndGet(b.count()); () }
        .start()
      stats += drain("ngram monitor 3 grams w=1min", q, () => acc.get())
      println(stats.last)
    }

    // ---------------- 6. streaming embedding card -------------------------
    {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<float>").as("vec"))
        .withColumn("ts", timestamp_micros(col("vec_id") * 1000L))
      val embDir = dir("emb_landing")
      writeChunks(emb.withColumn("ts_us", unix_micros(col("ts"))),
        "ts_us", chunks = 20, dir = embDir)
      val embSchema = spark.read.parquet(embDir).schema
      val nVecs = spark.read.parquet(embDir).count()
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val src = fileStream(embDir, embSchema, 2)
      val agg = graft.streaming.StreamingIngest.streamingEmbeddingCard(
        src, "ts", "vec", Seq("label"), "1 minute",
        watermark = Some("2 minutes"))
      val q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", dir("ck_emb_card"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          acc.addAndGet(b.count()); () }
        .start()
      stats += drain(s"embedding card $nVecs vecs w=1min", q, () => acc.get())
      println(stats.last)
    }

    println()
    println("| query | wall s | micro-batches | output rows | peak state rows | peak state MB |")
    println("|---|---|---|---|---|---|")
    stats.foreach { s =>
      println(f"| ${s.name} | ${s.seconds}%.1f | ${s.batches} | ${s.outRows} " +
        f"| ${s.peakStateRows} | ${s.peakStateBytes / 1e6}%.1f |")
    }
    spark.stop()
  }
}
