package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.engine.GraftEngine

/**
 * Shared, read-only engine stores built from the driver's testdata
 * (TESTDATA.md), reused across queries/bench runs. Mutation-shaped queries
 * must create their own private stores — these are never mutated.
 *
 *  - store "emb":  key = embeddings.embedding (64-dim), metadata
 *                  {vec_id, label} as raw strings.
 *  - store "docs": key = [doc_id] (1-dim), metadata {lang, source} always,
 *                  {long: "yes"} only when n_chars > 300 — exercising the
 *                  reference's missing-key NotEquals/NotIn semantics
 *                  (SURVEY.md §2.3).
 */
object TestStores {

  private val engines = TrieMap[String, GraftEngine]()

  /** STRUCT<kind,str,bin> metadata cell from a string column. */
  def metaStr(c: Column): Column =
    struct(lit("raw_string").as("kind"), c.cast(StringType).as("str"),
      lit(null).cast(BinaryType).as("bin"))

  private val tables = TrieMap[(String, String), DataFrame]()

  /** Memoized per (sfDir, table): `spark.read.parquet` without a supplied
    * schema runs a footer-inference job on EVERY call, and most queries
    * reference their tables several times per run — reusing the resolved
    * DataFrame (a lazy plan; nothing is cached) drops that fixed job from
    * every timed region. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    tables.getOrElseUpdate((sfDir, name), spark.read.parquet(s"$sfDir/$name.parquet"))

  /** events.parquet's `ts` physical type varies across driver testdata
    * generations: TIMESTAMP(NANOS) — which Spark's parquet reader only
    * accepts as a raw long via the legacy flag — or TIMESTAMP(MICROS),
    * which it reads natively (as TIMESTAMP_NTZ when the writer leaves
    * isAdjustedToUTC unset). Normalize either to a session-TZ (UTC)
    * TimestampType column carrying the same epoch micros the DuckDB
    * oracle computes with epoch_ns(ts)/1000. */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  def embEntries(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings").select(
      col("embedding").cast("array<float>").as("key"),
      map(
        lit("vec_id"), metaStr(col("vec_id")),
        lit("label"), metaStr(col("label"))).as("value"))

  def docEntries(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents").select(
      array(col("doc_id").cast("float")).as("key"),
      when(col("n_chars") > 300,
        map(
          lit("lang"), metaStr(col("lang")),
          lit("source"), metaStr(col("source")),
          lit("long"), metaStr(lit("yes"))))
        .otherwise(map(
          lit("lang"), metaStr(col("lang")),
          lit("source"), metaStr(col("source")))).as("value"))

  /** Engine with shared stores for this sfDir (built once per JVM). */
  def engine(spark: SparkSession, sfDir: String): GraftEngine =
    engines.getOrElseUpdate(sfDir, {
      val e = new GraftEngine(spark)
      e.createStore("emb", 64)
      e.set("emb", embEntries(spark, sfDir))
      e.createNonLinearIndex("emb", Seq(
        graft.types.NonLinearConfig.KDTreeConfig(),
        graft.types.NonLinearConfig.HNSWConfig()))
      e.createStore("docs", 1, predicates = Set("lang", "source"))
      e.set("docs", docEntries(spark, sfDir))
      e
    })

  /** A private engine for mutation-shaped queries (isolated per call). */
  def freshEngine(spark: SparkSession): GraftEngine = new GraftEngine(spark)

  private val li4Engines = TrieMap[String, GraftEngine]()

  /** Shared READ-ONLY 4-dim lineitem store with a KD-tree index — the
    * >4096-accept-set filtered-ANN probe. Built once per sfDir (outside any
    * bench timing region); queries must not mutate it. */
  def li4Engine(spark: SparkSession, sfDir: String): GraftEngine =
    li4Engines.getOrElseUpdate(sfDir, {
      val e = new GraftEngine(spark)
      e.createStore("li4", 4)
      val li = table(spark, sfDir, "lineitem")
      e.set("li4", li.select(
        array(col("l_orderkey").cast("float"), col("l_partkey").cast("float"),
          col("l_suppkey").cast("float"), col("l_linenumber").cast("float")).as("key"),
        map(lit("flag"), metaStr(col("l_returnflag"))).as("value")))
      e.createNonLinearIndex("li4",
        Seq(graft.types.NonLinearConfig.KDTreeConfig()))
      e
    })

  private val li4RoutedEngines = TrieMap[String, GraftEngine]()

  /** Shared READ-ONLY 4-dim lineitem store whose ONLY index is the
    * coarse-routed HNSW — the >4096-accept-set filtered probe through the
    * ROUTED dispatch's Bloom arm (the kdtree twin is [[li4Engine]]). The
    * corpus is the l_orderkey ≤ 2000 slice (~8k rows; `flag != R` accepts
    * ~5.3k > the 4096 brute-force cutover at every test sf), so the query
    * exercises Bloom-sketch in-filtering THROUGH the routed graphs.
    * Exactness by construction: probes = shards (exhaustive) and the beam
    * (efSearch 8192) exceeds any shard's row count, so the accept-aware
    * graph traversal — which walks THROUGH rejected nodes — degenerates
    * to an exact scan of each connected component. */
  def li4RoutedEngine(spark: SparkSession, sfDir: String): GraftEngine =
    li4RoutedEngines.getOrElseUpdate(sfDir, {
      val e = new GraftEngine(spark)
      e.createStore("li4r", 4)
      val li = table(spark, sfDir, "lineitem").where(col("l_orderkey") <= 2000)
      e.set("li4r", li.select(
        array(col("l_orderkey").cast("float"), col("l_partkey").cast("float"),
          col("l_suppkey").cast("float"), col("l_linenumber").cast("float")).as("key"),
        map(lit("flag"), metaStr(col("l_returnflag"))).as("value")))
      e.createNonLinearIndex("li4r", Seq(
        graft.types.NonLinearConfig.RoutedHNSWConfig(
          hnsw = graft.types.NonLinearConfig.HNSWConfig(
            efConstruction = 128, maximumConnections = 32,
            maximumConnectionsZero = 64, efSearch = 8192,
            metric = graft.types.Algorithm.CosineSimilarity),
          numShards = 16, probes = 16)))
      e
    })

  private val li4ScanEngines = TrieMap[String, GraftEngine]()

  /** Shared READ-ONLY 4-dim FULL-lineitem store with a deliberately
    * PRUNED-probe routed index (probes 4 of 16) — the single-query
    * sharp-filter SLICE-SCAN probe (round 16): `qb = 7` accepts ~7.7% of
    * rows, which at sf ≥ 0.01 is > the 4096 absolute cutover but ≤ the
    * 10% scan fraction, so GetSimN routes to the exact in-shard slice
    * scan ([[graft.ann.AnnSearch.filteredRoute]]). The oracle GATES the
    * routing: if the dispatch ever rode the graphs instead, 4/16 probes
    * over a starved beam could not reproduce the exact filtered top-10. */
  def li4ScanEngine(spark: SparkSession, sfDir: String): GraftEngine =
    li4ScanEngines.getOrElseUpdate(sfDir, {
      val e = new GraftEngine(spark)
      e.createStore("li4s", 4)
      val li = table(spark, sfDir, "lineitem")
      e.set("li4s", li.select(
        array(col("l_orderkey").cast("float"), col("l_partkey").cast("float"),
          col("l_suppkey").cast("float"), col("l_linenumber").cast("float")).as("key"),
        map(lit("qb"),
          metaStr((col("l_quantity").cast("int") % 12).cast("string"))).as("value")))
      e.createNonLinearIndex("li4s", Seq(
        graft.types.NonLinearConfig.RoutedHNSWConfig(
          hnsw = graft.types.NonLinearConfig.HNSWConfig(
            efConstruction = 128, maximumConnections = 32,
            maximumConnectionsZero = 64, efSearch = 64,
            metric = graft.types.Algorithm.CosineSimilarity),
          numShards = 16, probes = 4)))
      e
    })

  private val aiEngines = TrieMap[String, graft.ai.AiEngine]()

  /** Shared AI engine: store "ai_docs" = documents.text embedded with the
    * deterministic mock all-minilm-l6-v2, STOREORIGINAL, metadata
    * {doc_id, lang}. Read-only across queries. */
  def aiEngine(spark: SparkSession, sfDir: String): graft.ai.AiEngine =
    aiEngines.getOrElseUpdate(sfDir, {
      val ai = new graft.ai.AiEngine(new GraftEngine(spark))
      ai.createStore("ai_docs", "all-minilm-l6-v2", "all-minilm-l6-v2",
        predicates = Set("lang"), storeOriginal = true)
      val entries = table(spark, sfDir, "documents").select(
        struct(lit("raw_string").as("kind"), col("text").as("str"),
          lit(null).cast(BinaryType).as("bin")).as("input"),
        map(
          lit("doc_id"), metaStr(col("doc_id")),
          lit("lang"), metaStr(col("lang"))).as("value"))
      ai.setDf("ai_docs", entries)
      ai
    })

  private val mhIndexes = TrieMap[String, graft.dedup.MinHashIndex]()

  /** Shared READ-ONLY MinHash index over the history slice
    * (doc_id % 5 != 0) — the persisted artifact the incremental-dedup
    * queries probe. Built once per sfDir into a temp dir (outside any
    * bench timing region, like the engine stores: the production story is
    * index-once/probe-per-batch, so the per-query timings measure the
    * PROBE; the build path is exercised by IncrementalDedupSpec and the
    * dedup_incremental correctness run). Never appended to by queries. */
  def minHashIndex(spark: SparkSession, sfDir: String): graft.dedup.MinHashIndex =
    mhIndexes.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-mh-shared").toString
      graft.dedup.IncrementalDedup.buildIndex(
        table(spark, sfDir, "documents").where(col("doc_id") % 5 =!= 0),
        "doc_id", "text", dir, sourceStamp = sfDir)
    })

  /** (id, key) projection of the embeddings table — the ANN-family input
    * shape (LONG id, ARRAY<FLOAT> key). */
  def embKeyed(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings").select(
      col("vec_id").cast("long").as("id"),
      col("embedding").cast("array<float>").as("key"))

  /** Artifact source stamp = data dir + parquet mtime: survives process
    * restarts (the point of the artifact), invalidates when the driver
    * regenerates testdata in place. */
  private def dataStamp(sfDir: String, name: String): String = {
    val p = java.nio.file.Paths.get(sfDir, s"$name.parquet")
    s"$sfDir@${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
  }

  /** Stable per-(kind, sfDir) artifact dir under the system tmpdir, so a
    * later JVM (process-isolated bench families, the sf1 stress sessions)
    * LOADS the stamped artifact instead of retraining — the production
    * index-once/probe-per-query split, same policy as [[minHashIndex]]. */
  private[queries] def artifactDir(kind: String, sfDir: String): String =
    java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-$kind-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString

  private val ivfIndexes = TrieMap[String, graft.ann.IvfIndex]()

  /** Shared READ-ONLY IVF index over the embeddings table (nCells = 8,
    * iters = 2, Euclidean — the config every IVF-family query uses).
    * First process per data version trains + saves the stamped artifact
    * ([[graft.ann.IvfIndex.buildOrLoad]]); every later one restores
    * bit-identical centroids and reads the cell-partitioned parquet —
    * zero Lloyd iterations. Queries must never unpersist or mutate it. */
  def ivfIndex(spark: SparkSession, sfDir: String): graft.ann.IvfIndex =
    ivfIndexes.getOrElseUpdate(sfDir,
      graft.ann.IvfIndex.buildOrLoad(embKeyed(spark, sfDir), nCells = 8,
        dir = artifactDir("ivf", sfDir),
        sourceStamp = dataStamp(sfDir, "embeddings"), iters = 2))

  private val ivfLabeled = TrieMap[String, graft.ann.IvfIndex]()

  /** Shared LABELED cosine IVF (label payload in the cells table — the
    * hard-negative mining arm needs it beside the vectors), stamped +
    * persisted under its own artifact dir like [[ivfIndex]]. */
  def ivfLabeledIndex(spark: SparkSession, sfDir: String): graft.ann.IvfIndex =
    ivfLabeled.getOrElseUpdate(sfDir,
      graft.ann.IvfIndex.buildOrLoad(
        table(spark, sfDir, "embeddings").select(
          col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<float>").as("key"),
          col("label")),
        nCells = 8, dir = artifactDir("ivfl", sfDir),
        sourceStamp = dataStamp(sfDir, "embeddings"), iters = 2,
        metric = graft.types.Algorithm.CosineSimilarity))

  private val routedIndexes = TrieMap[String, graft.ann.RoutedAnnIndex]()

  /** Shared coarse-ROUTED HNSW index over the embeddings table (8 shards,
    * the reference's cosine build params), stamped + persisted like
    * [[ivfIndex]]: first process per data version trains the routing
    * centroids and serializes the shard graphs; later ones deserialize —
    * zero Lloyd rounds, zero graph builds.
    *
    * The `embed_topk_hnsw_routed` oracle pins this APPROXIMATE index to
    * the exact brute-force top-k, which is only sound when every shard
    * graph fits inside the search beam. That precondition is ENFORCED,
    * not assumed: efSearch is derived from the table size (>= total rows,
    * so no k-means imbalance can overflow any one shard's beam) and the
    * built index is re-checked shard-by-shard — a larger embeddings table
    * widens the beam instead of silently flaking the exact-set gate. */
  def routedIndex(spark: SparkSession, sfDir: String): graft.ann.RoutedAnnIndex =
    routedIndexes.getOrElseUpdate(sfDir, {
      val keyed = embKeyed(spark, sfDir)
      val ef = math.max(128L, keyed.count()).toInt
      val idx = graft.ann.RoutedAnnIndex.buildOrLoad(keyed, 64,
        graft.types.NonLinearConfig.HNSWConfig(
          efConstruction = 100, maximumConnections = 40,
          maximumConnectionsZero = 80, efSearch = ef,
          metric = graft.types.Algorithm.CosineSimilarity),
        numShards = 8, dir = artifactDir("routed", sfDir),
        sourceStamp = dataStamp(sfDir, "embeddings"), iters = 2)
      val maxShard = idx.shards.map {
        case h: graft.ann.HnswShard => h.index.size.toLong
        case _ => 0L
      }.fold(0L)(math.max)
      require(maxShard <= ef,
        s"routed test fixture: largest shard ($maxShard rows) exceeds " +
          s"efSearch=$ef — the exact-set oracle precondition is violated")
      idx
    })

  private val routedSq8Indexes = TrieMap[String, graft.ann.RoutedAnnIndex]()

  /** Shared SQ8-quantized routed index over embeddings (round 14) — the
    * [[routedIndex]] fixture's quantized twin, own artifact dir (storage
    * is artifact identity, the dirs never cross). Beam covers every
    * shard, so the rescored join at exhaustive probes is the exact-set
    * oracle precondition, same as the float fixture. */
  def routedSq8Index(spark: SparkSession, sfDir: String): graft.ann.RoutedAnnIndex =
    routedSq8Indexes.getOrElseUpdate(sfDir, {
      val keyed = embKeyed(spark, sfDir)
      val ef = math.max(128L, keyed.count()).toInt
      graft.ann.RoutedAnnIndex.buildOrLoad(keyed, 64,
        graft.types.NonLinearConfig.HNSWConfig(
          efConstruction = 100, maximumConnections = 40,
          maximumConnectionsZero = 80, efSearch = ef,
          metric = graft.types.Algorithm.CosineSimilarity),
        numShards = 8, dir = artifactDir("routed-sq8", sfDir),
        sourceStamp = dataStamp(sfDir, "embeddings"), iters = 2,
        storage = graft.ann.StorageSpec.Sq8)
    })

  private val routedPqIndexes = TrieMap[String, graft.ann.RoutedAnnIndex]()

  /** Shared PQ-quantized routed index over embeddings (round 15) — the
    * [[routedSq8Index]] fixture's byte-budget twin (storage =
    * pq(m=8,ksub=256), the bare-"pq" resolution at dim 64; own artifact
    * dir — storage is artifact identity). Beam covers every shard, so
    * the rescored join at exhaustive probes is the exact-set oracle
    * precondition, same as the float and SQ8 fixtures. */
  def routedPqIndex(spark: SparkSession, sfDir: String): graft.ann.RoutedAnnIndex =
    routedPqIndexes.getOrElseUpdate(sfDir, {
      val keyed = embKeyed(spark, sfDir)
      val ef = math.max(128L, keyed.count()).toInt
      graft.ann.RoutedAnnIndex.buildOrLoad(keyed, 64,
        graft.types.NonLinearConfig.HNSWConfig(
          efConstruction = 100, maximumConnections = 40,
          maximumConnectionsZero = 80, efSearch = ef,
          metric = graft.types.Algorithm.CosineSimilarity),
        numShards = 8, dir = artifactDir("routed-pq", sfDir),
        sourceStamp = dataStamp(sfDir, "embeddings"), iters = 2,
        storage = graft.ann.StorageSpec.Pq(m = 8, ksub = 256))
    })

  private val routedOpqIndexes = TrieMap[String, graft.ann.RoutedAnnIndex]()

  /** Shared routed OPQ-quantized index artifact — the [[routedPqIndex]]
    * fixture's learned-rotation twin (storage = opq(m=8,ksub=256): same
    * m-byte codes, trained in the rotated basis — Ge et al. 2013).
    * Exhaustive probes + rescore ⇒ exact, so the join query oracles
    * against the same brute-force SQL as every routed storage. */
  def routedOpqIndex(spark: SparkSession, sfDir: String): graft.ann.RoutedAnnIndex =
    routedOpqIndexes.getOrElseUpdate(sfDir, {
      val keyed = embKeyed(spark, sfDir)
      val ef = math.max(128L, keyed.count()).toInt
      graft.ann.RoutedAnnIndex.buildOrLoad(keyed, 64,
        graft.types.NonLinearConfig.HNSWConfig(
          efConstruction = 100, maximumConnections = 40,
          maximumConnectionsZero = 80, efSearch = ef,
          metric = graft.types.Algorithm.CosineSimilarity),
        numShards = 8, dir = artifactDir("routed-opq", sfDir),
        sourceStamp = dataStamp(sfDir, "embeddings"), iters = 2,
        storage = graft.ann.StorageSpec.Opq(m = 8, ksub = 256))
    })

  private val pqBooks = TrieMap[String, graft.ann.PqCodebook]()

  /** Shared PQ codebook (m = 8, ksub = 64, iters = 2 — the config both
    * PQ queries use), stamped + persisted like [[ivfIndex]]: trained once
    * per data version, loaded bit-identical everywhere after. */
  def pqCodebook(spark: SparkSession, sfDir: String): graft.ann.PqCodebook =
    pqBooks.getOrElseUpdate(sfDir,
      graft.ann.PqCodebook.trainOrLoad(embKeyed(spark, sfDir), m = 8,
        ksub = 64, dir = artifactDir("pq", sfDir),
        sourceStamp = dataStamp(sfDir, "embeddings"), iters = 2))

  private val routedEngines = TrieMap[String, GraftEngine]()

  /** Shared READ-ONLY engine whose "embr" store carries ONLY the
    * "hnsw_routed" extension index, so `getSimN(..., Algorithm.HNSW)`
    * dispatches to the coarse-routed sharded index through the
    * reference-parity API (no extension DSL involved). probes = numShards
    * (exhaustive) + a beam wider than any shard at the test scale factors
    * ⇒ the result EQUALS exact cosine top-k and earns the full oracle;
    * pruned-probe recall is RoutedAnnSpec / ScaleRecall territory. */
  def routedEngine(spark: SparkSession, sfDir: String): GraftEngine =
    routedEngines.getOrElseUpdate(sfDir, {
      val e = new GraftEngine(spark)
      e.createStore("embr", 64)
      e.set("embr", embEntries(spark, sfDir))
      e.createNonLinearIndex("embr", Seq(
        graft.types.NonLinearConfig.RoutedHNSWConfig(
          hnsw = graft.types.NonLinearConfig.HNSWConfig(
            efConstruction = 100, maximumConnections = 40,
            maximumConnectionsZero = 80, efSearch = 4096),
          numShards = 8, probes = 8)))
      e
    })

  /** Raw text of one document (the AI-layer query probe). */
  def docText(spark: SparkSession, sfDir: String, docId: Long): String =
    table(spark, sfDir, "documents").where(col("doc_id") === docId)
      .select("text").head.getString(0)

  /** The deterministic 64-dim query vector: embedding of vec_id = 0. */
  def queryVec(spark: SparkSession, sfDir: String): Array[Float] =
    table(spark, sfDir, "embeddings").where(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).toArray

  /** vec_id / similarity projection of a GetSimN result for oracle compare:
    * sim = round(double(float(score)), 4) — mirrored in the DuckDB oracle as
    * round(CAST(CAST(expr AS FLOAT) AS DOUBLE), 4). */
  def simResult(res: DataFrame): DataFrame =
    res.select(
      element_at(col("value"), "vec_id").getField("str").cast("bigint").as("vec_id"),
      round(col("similarity").cast("double"), 4).as("sim"))
}
