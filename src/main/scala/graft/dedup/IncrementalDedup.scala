package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental near-dedup against a PERSISTED MinHash index — the ingestion
 * pattern every in-process near-dup join in [[Dedup]] cannot serve: a
 * historical corpus is indexed ONCE, and each arriving batch (the daily
 * crawl, the next dump shard) is deduplicated against all of history
 * WITHOUT rescanning, re-shingling, or re-hashing the corpus. At 100 TB
 * the corpus-side work is the whole bill — this module moves it out of the
 * per-batch loop.
 *
 * The artifact has two tables plus a manifest:
 *  - `bands/`  — (band INT, value LONG, id LONG), PARTITIONED BY band: the
 *    LSH candidate surface. A batch probe joins on (band, value), so band
 *    partition pruning applies and rows are 20 bytes each.
 *  - `sets/`   — (id LONG, hs ARRAY<LONG>): the per-doc distinct
 *    shingle-hash sets ([[Dedup.docShingleSets]]'s exact-verify payload).
 *    Persisting them means verification NEVER touches the original corpus
 *    text (which may be in cold storage); candidates fetch their sets by
 *    an id equi-join bounded by candidate volume.
 *  - `minhash_manifest.json` — shingle width n, numHashes, and the stamp
 *    LIST of every source batch folded in (build + appends). Loads refuse
 *    on config mismatch: an index probed with different n/numHashes would
 *    silently return garbage candidates.
 *
 * Signatures and bands are derived EXACTLY as [[Dedup.minHashLshJoin]]
 * derives them (same [[Dedup.permParams]] permutations over the same
 * xxhash64 shingle domain — shared private[dedup] constants, so the three
 * call sites can never drift), which makes the batch-vs-index candidate
 * contract identical to the in-process join's: any pair with ANY agreeing
 * minhash collides in some band; P(miss | J ≥ 0.8, 16 bands) ≈ 1e-11.
 *
 * Per-batch cost at scale: shingle+minhash the BATCH only (a projection),
 * one (band, value) equi-join whose streamed side is batch-sized, a
 * size-ratio-pruned exact-Jaccard verify over candidate ids only, and —
 * for [[append]] — one parquet append of batch bands/sets. Nothing ever
 * re-reads history; the index grows by exactly the batch's rows. Skewed
 * band values (a boilerplate-heavy corpus collapsing many docs onto one
 * signature value) surface as candidate volume, and the verify's
 * size-ratio prefilter plus the banded geometry bound them the same way
 * the in-process join's do.
 */
final class MinHashIndex private[dedup] (
    val dir: String,
    val n: Int,
    val numHashes: Int,
    val sourceStamps: Seq[String],
    /** Indexed doc count (= sets rows), from the manifest / build count —
      * free to read, used by [[IncrementalDedup.dedupAgainst]] to decide
      * whether avoiding a history-sets shuffle is worth a candidate
      * count-and-broadcast step. */
    val setRows: Long,
    private val spark: SparkSession) {

  def bands: DataFrame = {
    val raw = spark.read.parquet(
      java.nio.file.Paths.get(dir, "bands").toString)
    // partitionBy moved `band` to a discovered partition column; restore
    // build order/type so unioned appends line up
    raw.select(col("id"), col("band").cast("int"), col("value"))
  }

  def sets: DataFrame = spark.read.parquet(
    java.nio.file.Paths.get(dir, "sets").toString)
}

object IncrementalDedup {

  /** Band table (id, band, value) off a per-doc shingle-set frame —
    * exactly the [[Dedup.minHashLshJoin]] derivation. */
  private def bandsFromSets(sets: DataFrame, numHashes: Int): DataFrame =
    // one MinHashSig kernel pass per doc (values identical to the HOF
    // formulation — DedupSpec pins it — so existing on-disk band tables
    // stay probe-compatible)
    sets.select(col("id"),
      posexplode(Dedup.minHashKernel(col("hs"), numHashes))
        .as(Seq("band", "value")))

  private def writeTables(dir: String, bands: DataFrame, sets: DataFrame,
      mode: String): Unit = {
    bands.write.mode(mode).partitionBy("band")
      .parquet(java.nio.file.Paths.get(dir, "bands").toString)
    sets.write.mode(mode)
      .parquet(java.nio.file.Paths.get(dir, "sets").toString)
  }

  private def writeManifest(dir: String, n: Int, numHashes: Int,
      stamps: Seq[String], setRows: Long): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val json = JObject(
      "kind" -> JString("minhash-index"),
      "n" -> JInt(n), "numHashes" -> JInt(numHashes),
      // torn-write detection: bands/sets are two separate parquet writes
      // (appends on [[append]]), so a crash between them leaves band rows
      // whose id has no sets row — probes would silently drop those
      // candidates at the sets equi-join. The manifest records the expected
      // cumulative row counts (bands = sets × numHashes by construction:
      // one exploded band row per hash per doc) and [[load]] verifies them,
      // refusing with None-means-rebuild on mismatch — the same discipline
      // the config check already applies.
      "setRows" -> JInt(setRows),
      "sourceStamps" -> JArray(stamps.toList.map(JString(_))))
    val target = java.nio.file.Paths.get(dir, "minhash_manifest.json")
    val tmp = target.resolveSibling("minhash_manifest.json.tmp")
    java.nio.file.Files.writeString(tmp, JsonMethods.pretty(JsonMethods.render(json)))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def countParquet(spark: SparkSession, dir: String,
      table: String): Long =
    spark.read.parquet(java.nio.file.Paths.get(dir, table).toString).count()

  /** Index a corpus: one shingle shuffle (the docShingleSets groupBy — the
    * same single corpus shuffle the in-process join pays), band projection,
    * two parquet writes. This is the ONCE-per-history cost. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String, dir: String,
      sourceStamp: String, n: Int = 3, numHashes: Int = 16): MinHashIndex = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val sets = Dedup.docShingleSets(df, idCol, textCol, n).persist()
    try {
      writeTables(dir, bandsFromSets(sets, numHashes), sets, "overwrite")
      val setRows = countParquet(df.sparkSession, dir, "sets")
      writeManifest(dir, n, numHashes, Seq(sourceStamp), setRows)
      new MinHashIndex(dir, n, numHashes, Seq(sourceStamp), setRows,
        df.sparkSession)
    } finally sets.unpersist(blocking = false)
  }

  /** None (caller rebuilds) on a missing/corrupt manifest or a config
    * mismatch against the requested (n, numHashes). */
  def load(spark: SparkSession, dir: String, n: Int = 3,
      numHashes: Int = 16): Option[MinHashIndex] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir, "minhash_manifest.json")
      if (!java.nio.file.Files.exists(p)) return None
      val j = JsonMethods.parse(java.nio.file.Files.readString(p))
      if ((j \ "kind") != JString("minhash-index")) return None
      if ((j \ "n") != JInt(n) || (j \ "numHashes") != JInt(numHashes)) return None
      val stamps = (j \ "sourceStamps") match {
        case JArray(ss) => ss.map {
          case JString(s) => s
          case _ => return None
        }
        case _ => return None
      }
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "bands")) ||
          !java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "sets")))
        return None
      // torn-write check (see writeManifest): verify the on-disk row counts
      // against the manifest's expected totals. count() over parquet is a
      // footer-metadata scan, not a data read — cheap even on a large
      // index. Pre-count manifests (JNothing) fail the match → rebuild.
      val expectedSets = (j \ "setRows") match {
        case JInt(v) => v.toLong
        case _ => return None
      }
      if (countParquet(spark, dir, "sets") != expectedSets ||
          countParquet(spark, dir, "bands") != expectedSets * numHashes)
        return None
      Some(new MinHashIndex(dir, n, numHashes, stamps, expectedSets, spark))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Load with whatever (n, numHashes) the manifest records — the DSL /
    * exploratory form, where the caller doesn't know the build config and
    * wants the index's own. None on a missing/corrupt manifest. */
  def loadAny(spark: SparkSession, dir: String): Option[MinHashIndex] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir, "minhash_manifest.json")
      if (!java.nio.file.Files.exists(p)) return None
      val j = JsonMethods.parse(java.nio.file.Files.readString(p))
      ((j \ "n"), (j \ "numHashes")) match {
        case (JInt(n), JInt(nh)) => load(spark, dir, n.toInt, nh.toInt)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Dedup a batch against the index: (a = batch id, b = indexed id, jac)
    * for every cross pair with exact n-gram Jaccard ≥ `threshold` whose
    * MinHash signatures collide in ≥ 1 band. Batch ids and indexed ids are
    * separate id spaces (nothing assumes disjointness or ordering — the
    * pair is directional: batch → history).
    *
    * Scale shape: the batch side is shingled/banded fresh (batch-sized
    * projections); candidates come from the (band, value) equi-join
    * against the persisted band table (band partition pruning applies);
    * the exact verify size-ratio-prunes candidates over narrow int
    * columns, then fetches BOTH sides' shingle sets by id equi-joins
    * bounded by candidate volume — the native intersect-count kernel
    * scores each surviving pair. History is read, never recomputed. */
  /** Broadcast bounds for [[dedupAgainst]]'s batch-bounded sides (rows,
    * bytes-conscious: band rows are ~20 B and candidate rows ~24 B, so 4M
    * rows build a ~100-150 MB hash relation — inside executor budgets).
    * Past a bound the shuffle shape takes over — correct at any size,
    * just not history-shuffle-free.
    *
    * MEMORY ASSUMPTION (ADVICE r17, made explicit): a built hash relation
    * runs 2-4× its data bytes, so the 4M bounds assume ≥ ~2 GB of spare
    * driver heap (the collect) and per-executor memory (the relation) —
    * true of this repo's 8g default driver (build.sbt SPARK_DRIVER_MEM)
    * and of any production executor sized per guide §5. Deployments below
    * that should lower `spark.graft.dedupBroadcastRows`, which overrides
    * both bounds (a malformed value fails here, naming the key). */
  private def confRows(key: String, dflt: Long): Long = {
    val s = org.apache.spark.sql.SparkSession.active
    val raw = s.conf.get(key, dflt.toString)
    try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$key must be a row count, got '$raw'")
    }
  }
  private def MaxBroadcastBandRows: Long =
    confRows("spark.graft.dedupBroadcastRows", 4000000L)
  private def MaxBroadcastCandidates: Long =
    confRows("spark.graft.dedupBroadcastRows", 4000000L)

  /** History size below which the broadcast machinery (batch count job,
    * forced band-probe broadcast, candidate count+broadcast) is not worth
    * its extra jobs/barrier — see the gate in [[dedupAgainst]]. Bracketed
    * by measurement (interleaved A/B): at a 4k-doc history with ~500-doc
    * stream batches the machinery read 1.39-1.50 (barrier dominates); at
    * a 400k-doc history with a 100k-doc batch it read 0.942 (avoided
    * history shuffles dominate — and the asymmetry only grows with
    * history). The bound is in history ROWS — the quantity the avoided
    * shuffles' cost is proportional to — not a machine constant. */
  private val MinHistoryRowsForCountedBroadcast = 100000L

  def dedupAgainst(index: MinHashIndex, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val bSets = Dedup.docShingleSets(batch, idCol, textCol, index.n).persist()
    try {
      // Round-17 (guide §3.1/§3.2): the BATCH is the bounded side by
      // design, so broadcast it through the candidate probe — the history
      // band table is then SCANNED once per batch and never shuffled.
      // Without the explicit broadcast the planner's estimate (an explode
      // behind a cache) picks sort-merge, and AQE's late conversion can't
      // help: both shuffle WRITES — including the history band table's —
      // have already run by the time it replans the join. The count also
      // materializes the batch cache (one cheap job on cached blocks).
      // The whole machinery (count job, forced broadcasts, candidate
      // count) engages only when the HISTORY is big enough for its
      // shuffles to be worth avoiding (setRows — free from the manifest);
      // below the gate the pre-round fused shape runs with ZERO extra
      // jobs (the per-micro-batch stream probe against a small history
      // measured the always-on machinery at 1.39-1.50, interleaved).
      val bigHistory = index.setRows >= MinHistoryRowsForCountedBroadcast
      val nBatch = if (bigHistory) bSets.count() else 0L
      val smallBatch =
        bigHistory && nBatch * index.numHashes <= MaxBroadcastBandRows
      val bBands = bandsFromSets(bSets, index.numHashes)
      val probe = if (smallBatch) broadcast(bBands) else bBands
      val candidates = probe.as("x")
        .join(index.bands.as("y"),
          col("x.band") === col("y.band") && col("x.value") === col("y.value"))
        .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      val bSizes = bSets.select(col("id").as("a"),
        size(col("hs")).cast("long").as("na"))
      val withNa = candidates
        .join(if (smallBatch) broadcast(bSizes) else bSizes, "a")
      val t = lit(threshold)
      def interCount(a: Column, b: Column): Column = {
        import org.apache.spark.sql.graftbridge.{ColumnBridge, LongSetIntersectCount}
        ColumnBridge.column(LongSetIntersectCount(
          ColumnBridge.expression(a), ColumnBridge.expression(b)))
      }
      def finish(withSets: DataFrame): DataFrame = withSets
        .withColumn("inter", interCount(col("ha"), col("hb")))
        .withColumn("jac", col("inter").cast("double") /
          (size(col("ha")).cast("long") + size(col("hb")).cast("long") - col("inter")))
        .where(col("jac") >= threshold)
        .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
        .localCheckpoint() // eager: bSets unpersists on return (see jaccardJoin)
      // Candidate volume is bounded by the banded geometry + the batch
      // size; when the measured count fits the broadcast budget, the
      // verify fetches history sets through a BROADCAST of the candidates
      // — history sets are scanned, never shuffled, and the size-ratio
      // prune runs inline on size(hb) in the same codegen stage (same
      // filter, no separate history-sizes join to shuffle). Past the
      // budget: the previous shuffle shape, narrow-column prune first.
      // GATED ON HISTORY SIZE (free from the index manifest): the
      // persist+count of candidates is a materialization barrier, and on
      // a SMALL history the barrier costs more than the shuffles it
      // avoids — measured on the per-micro-batch stream probe
      // (docs_dedup_incr_stream, ~500-doc batches against a 4k-doc
      // history): interleaved A/B 1.39-1.50 with the barrier always-on,
      // refuted back to the fused shape below the gate. A big history is
      // where shuffle avoidance pays by construction.
      if (smallBatch) {
        val candCached = withNa.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val nCand = candCached.count()
          if (nCand <= MaxBroadcastCandidates) {
            val withB = broadcast(candCached)
              .join(index.sets.select(col("id").as("b"), col("hs").as("hb")), "b")
              .where(col("na") * t <= size(col("hb")).cast("long") &&
                size(col("hb")).cast("long") * t <= col("na"))
              .join(broadcast(bSets.select(col("id").as("a"), col("hs").as("ha"))), "a")
            finish(withB)
          } else {
            val iSizes = index.sets.select(col("id").as("b"),
              size(col("hs")).cast("long").as("nb"))
            val pruned = candCached.join(iSizes, "b")
              .where(col("na") * t <= col("nb") && col("nb") * t <= col("na"))
              .select("a", "b")
            finish(pruned
              .join(bSets.select(col("id").as("a"), col("hs").as("ha")), "a")
              .join(index.sets.select(col("id").as("b"), col("hs").as("hb")), "b"))
          }
        } finally candCached.unpersist(blocking = false)
      } else {
        // small history (or oversized batch): the pre-round fused shape —
        // narrow-column prune, then the set-fetch joins, one pipeline
        val iSizes = index.sets.select(col("id").as("b"),
          size(col("hs")).cast("long").as("nb"))
        val pruned = withNa.join(iSizes, "b")
          .where(col("na") * t <= col("nb") && col("nb") * t <= col("na"))
          .select("a", "b")
        finish(pruned
          .join(bSets.select(col("id").as("a"), col("hs").as("ha")), "a")
          .join(index.sets.select(col("id").as("b"), col("hs").as("hb")), "b"))
      }
    } finally bSets.unpersist(blocking = false)
  }

  /** Fold a batch INTO the index (after the caller has filtered it with
    * [[dedupAgainst]] to whatever keep policy applies): appends the
    * batch's bands and sets — one parquet append each, no history
    * rewrite — and records the batch stamp in the manifest. Returns the
    * updated handle. Caller owns id-space discipline: appending an id the
    * index already holds creates a duplicate row, not a replacement. */
  def append(index: MinHashIndex, batch: DataFrame, idCol: String,
      textCol: String, sourceStamp: String): MinHashIndex = {
    val sets = Dedup.docShingleSets(batch, idCol, textCol, index.n).persist()
    try {
      // bands first, sets second, manifest (atomic move) last: a crash at
      // any point leaves a manifest whose setRows no longer matches the
      // on-disk counts, so the next load() refuses and the caller rebuilds
      // — no partial fold is ever probed.
      writeTables(index.dir, bandsFromSets(sets, index.numHashes), sets, "append")
      val stamps = index.sourceStamps :+ sourceStamp
      val setRows = countParquet(sets.sparkSession, index.dir, "sets")
      writeManifest(index.dir, index.n, index.numHashes, stamps, setRows)
      new MinHashIndex(index.dir, index.n, index.numHashes, stamps, setRows,
        sets.sparkSession)
    } finally sets.unpersist(blocking = false)
  }

  /** Load if config-compatible, else build and save — the one-call form
    * (stamp freshness is the caller's policy here: an index is APPENDED
    * to, not invalidated, as sources arrive — so load matches on config,
    * and callers compare `sourceStamps` if they need build provenance). */
  def buildOrLoad(df: DataFrame, idCol: String, textCol: String, dir: String,
      sourceStamp: String, n: Int = 3, numHashes: Int = 16): MinHashIndex =
    load(df.sparkSession, dir, n, numHashes)
      .getOrElse(buildIndex(df, idCol, textCol, dir, sourceStamp, n, numHashes))
}
