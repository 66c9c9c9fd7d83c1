package graft.ai

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.engine.GraftEngine
import graft.types._
import graft.types.PredicateCondition.In

/**
 * The AI proxy layer: keys stores by RAW input (text/image/audio) instead of
 * vectors; embeds with the store's configured models, then delegates every
 * operation to the DB engine — the Spark-native reshaping of
 * /root/reference/ahnlich/ai/src/engine/{operations.rs,store.rs}.
 *
 * Reserved metadata keys (ai/src/lib.rs:10-12):
 *  - `_ahnlich_input_key`: the raw input stashed in metadata when the store
 *    is created STOREORIGINAL, so GetKey/DelKey by raw input work;
 *  - `_ahnlich_one_to_many_index`: sequential output index for one-to-many
 *    models (face detectors) that expand one input into many entries.
 *
 * Scale design: the embedding stage runs inside `mapPartitions` with a
 * broadcast [[Embedder]] (one model session per executor partition — the
 * data-parallel reshape of the reference's one-green-thread-per-model,
 * ai/src/manager/mod.rs:35-140), and the composite "delete stale entries
 * for re-ingested inputs, then set" write (operations.rs:229-266) uses a
 * broadcast semi-join on the reserved key instead of a driver-collected
 * literal list, so nothing driver-side scales with batch size.
 */
class AiEngine(val db: GraftEngine) {

  val ReservedKey = "_ahnlich_input_key"
  val OneToManyKey = "_ahnlich_one_to_many_index"
  private def spark = db.spark
  import StoreSchema.{metadataValueType, valueType}

  private val inputSchema = StructType(Seq(
    StructField("input", metadataValueType, nullable = false),
    StructField("value", valueType, nullable = false)))

  /** AI-layer spans (graft.obs.Trace). The proxy's own work (embedding,
    * reserved-key plumbing) traces as an `AI.*` span; the DB ops it
    * delegates to open their own nested spans, so the span tree shows
    * proxy overhead vs engine work — the same two-level view the
    * reference's tracer gives its AI proxy (ahnlich/ai spans over db
    * client calls). Pure passthroughs (dropStore etc.) are not re-wrapped:
    * the DB-level span already carries them. */
  @inline private def traced[T](op: String, name: String, schema: String)(f: => T): T =
    graft.obs.Trace.span(spark, op,
      if (schema == db.DefaultSchema) name else s"$schema.$name")(f)

  // ------------------------------------------------------------- create/drop

  /** AI CreateStore (operations.rs:83-136): dimension comes from the index
    * model; query/index embedding dims must match (ai/src/engine/
    * store.rs:173-178); reserved predicates registered automatically. */
  def createStore(name: String, queryModel: String, indexModel: String,
      predicates: Set[String] = Set.empty,
      nonLinearIndexes: Seq[NonLinearConfig] = Seq.empty,
      errorIfExists: Boolean = true,
      storeOriginal: Boolean = false,
      schema: String = db.DefaultSchema): Boolean = traced("AI.CreateStore", name, schema) {
    val qm = Models.details(queryModel)
    val im = Models.details(indexModel)
    if (qm.dim != im.dim)
      throw GraftException(
        s"Query model $queryModel dimension ${qm.dim} does not match index model $indexModel dimension ${im.dim}")
    var preds = predicates
    if (storeOriginal) preds += ReservedKey
    if (im.oneToMany) preds += OneToManyKey
    db.createStore(name, im.dim, preds, nonLinearIndexes, errorIfExists,
      schema, storeOriginal, Some(qm.name), Some(im.name))
  }

  private def aiMeta(name: String, schema: String): StoreMeta = {
    val m = db.storeMeta(name, schema)
    if (m.indexModel.isEmpty)
      throw GraftException(s"Store $name is not an AI store (no index model)")
    m
  }

  // ------------------------------------------------------------------- write

  /** AI Set — validate input types, stash originals, embed, and run the
    * composite DelPred+Set write (operations.rs:182-267). Driver-side entry
    * for DSL/small batches; the heavy lifting is [[setDf]]. */
  def set(name: String, entries: Seq[(MetadataValue, Map[String, MetadataValue])],
      schema: String = db.DefaultSchema,
      preprocessAction: String = "nopreprocessing",
      executionProvider: Option[String] = None): (Long, Long) =
    setDf(name, inputsDf(entries), schema, preprocessAction, executionProvider)

  /** Bulk path: entries as a DataFrame of (input STRUCT, value MAP).
    * `preprocessAction` / `executionProvider` are the request's session
    * config (protos/ai/preprocess.proto, execution_provider.proto); the mock
    * runtime has no token limits or EPs to apply, so they are validated and
    * RECORDED in the store's catalog meta (surfaced by GetStore) — the
    * observable analog of the reference's per-model session state
    * (ai/src/manager/mod.rs:35-140). */
  def setDf(name: String, entries: DataFrame,
      schema: String = db.DefaultSchema,
      preprocessAction: String = "nopreprocessing",
      executionProvider: Option[String] = None): (Long, Long) = traced("AI.Set", name, schema) {
    validateSessionConfig(preprocessAction, executionProvider)
    val meta = aiMeta(name, schema)
    val im = Models.details(meta.indexModel.get)
    // pin the batch ONCE: the validation aggregate below materializes the
    // cache, and the stale-delete probe + the embed input then read it — a
    // non-deterministic source can't disagree with itself across stages,
    // and no stage re-scans the source
    val pinned = entries.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE job resolves batch size + an example wrong input kind + a
      // reserved-key clash (three scans fused — the per-statement job count
      // is the AI write path's dominant cost on small batches)
      val kindCol = col("input").getField("kind")
      val clashCol =
        if (meta.storeOriginal) element_at(col("value"), ReservedKey).isNotNull
        else lit(false)
      val v = pinned.agg(
        count(lit(1)),
        max(when(kindCol =!= im.inputKind, kindCol)),
        count(when(clashCol, lit(1)))).head()
      if (v.getLong(0) == 0) {
        // no mutation will run, so no downstream catalog flush: record the
        // session config with its OWN flush or a restart would forget it
        recordSessionConfig(name, schema, preprocessAction, executionProvider)
        return (0L, 0L)
      }
      if (!v.isNullAt(1))
        throw GraftException(
          s"Index model ${im.name} expects ${im.inputKind} input, got ${v.getString(1)}")
      if (v.getLong(2) > 0)
        throw GraftException(s"Cannot insert reserved key $ReservedKey")
      recordSessionConfig(name, schema, preprocessAction, executionProvider)
      val prepared =
        if (meta.storeOriginal)
          pinned.withColumn("value",
            map_concat(col("value"), map(lit(ReservedKey), col("input"))))
        else pinned
      val embedded = embedEntries(prepared, im)
      // stale-entry cleanup fused into the write (operations.rs:229-266):
      // store entries whose reserved input matches an incoming input are
      // deleted in the SAME swap as the set, so one-to-many re-ingestion
      // can't leave orphaned expansions behind and the store pays ONE
      // rewrite, not two. The stale ids are CONSTRUCTED BY THE ENGINE under
      // the store lock (a frame built here could straddle a concurrent
      // mutation's generation swap); empty stores skip the probe there too.
      if (meta.storeOriginal)
        db.delIdsAndSet(name,
          storeDf => staleIdsByReservedInput(storeDf, pinned.select("input")),
          embedded, schema)
      else db.set(name, embedded, schema)
    } finally pinned.unpersist(blocking = false)
  }

  private val PreprocessActions = Set("nopreprocessing", "modelpreprocessing")
  private val ExecutionProviders = Set("coreml", "tensorrt", "directml", "cuda")

  // Locale.ROOT: the default toLowerCase is locale-sensitive (Turkish
  // dotless-ı mangles "NOPREPROCESSING") — keyword folding must not be
  // locale-sensitive, or the same script parses differently per JVM locale
  private def fold(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  private def validateSessionConfig(preprocessAction: String,
      executionProvider: Option[String]): Unit = {
    if (!PreprocessActions.contains(fold(preprocessAction)))
      throw GraftException(s"Unknown preprocess action $preprocessAction")
    executionProvider.filterNot(ep => ExecutionProviders.contains(fold(ep)))
      .foreach(ep => throw GraftException(s"Unknown execution provider $ep"))
  }

  /** Last-declared session config sticks to the store's catalog meta;
    * an absent EP keeps the previously recorded one. Flushed with its own
    * per-store record write (cheap — O(1) file, no Spark job): deferring to
    * the data write's flush would lose the config whenever the write turns
    * out to be a no-op (empty batch, zero-row delete), diverging the
    * restarted GetStore from in-memory state. The reference's manager
    * applies session state at request level, independent of op outcome. */
  private def recordSessionConfig(name: String, schema: String,
      preprocessAction: String, executionProvider: Option[String]): Unit =
    db.updateMeta(name, schema)(m => m.copy(
      preprocessAction = Some(fold(preprocessAction)),
      executionProvider = executionProvider.map(fold)
        .orElse(m.executionProvider)))

  /** Stale ids for DelPred(ReservedKey IN batch-inputs) — the delete itself
    * rides the engine's fused delIdsAndSet swap, which calls this UNDER the
    * store lock with the locked generation's df. The store scan is pruned by
    * a broadcast of 8-byte `xxhash64(input)` values ONLY — never the raw
    * payloads (an image/audio batch would otherwise broadcast every payload
    * byte); the tiny hash-matched candidate set is then verified by exact
    * input equality in a shuffle join (hash collisions can't delete a wrong
    * row). Returns a lazy id frame — the engine materializes it before
    * swapping. */
  private def staleIdsByReservedInput(st: DataFrame,
      inputs: DataFrame): DataFrame = {
    val keyCol = element_at(col("value"), ReservedKey)
    // `inputs` must derive from a frame the CALLER already pinned (setDf's
    // batch cache): the hash probe and the exact verify below must see the
    // SAME input set, or a non-deterministic source could disagree with
    // itself and miss stale deletions
    val probe = inputs.select("input").distinct()
    val probeHash = broadcast(probe.select(xxhash64(col("input")).as("_ph")))
    val candidates = st.where(keyCol.isNotNull)
      .join(probeHash, xxhash64(keyCol) === col("_ph"), "left_semi")
    candidates.join(
        probe.select(col("input").as("_probe")).hint("shuffle_hash"),
        keyCol === col("_probe"), "left_semi")
      .select("id")
  }

  /** The embedding stage: mapPartitions with a broadcast embedder; one-to-many
    * models flatMap one input row into several entries carrying the
    * sequential `_ahnlich_one_to_many_index` (ai/src/engine/store.rs:391-424). */
  private def embedEntries(prepared: DataFrame, im: ModelDetails): DataFrame = {
    val embedder = Embedders.forModel(im.name)
    val bEmbedder = spark.sparkContext.broadcast(embedder)
    val oneToMany = im.oneToMany
    val oneToManyKey = OneToManyKey // locals only — the closure must not capture `this`
    val outSchema = StructType(StoreSchema.entrySchema.drop(1))
    val outRdd = prepared.select("input", "value").rdd.mapPartitions { it =>
      val emb = bEmbedder.value
      it.flatMap { r =>
        val input = AiEngine.rowToMeta(r.getStruct(0))
        val value = r.getMap[String, Row](1)
        val vecs = emb.embedOne(input)
        vecs.zipWithIndex.map { case (vec, i) =>
          val v: Map[String, Row] =
            if (oneToMany)
              value.toMap + (oneToManyKey -> Row("raw_string", i.toString, null))
            else value.toMap
          Row(vec.toSeq, v)
        }
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  /** AI Upsert — always merge-mode; embeds new_input with the index model;
    * rejects one-to-many models (ai/src/engine/store.rs:433-497). Returns
    * (inserted, updated) like the DB upsert's Set-shaped response. */
  def upsert(name: String, cond: PredicateCondition,
      newInput: Option[MetadataValue] = None,
      newValue: Option[Map[String, MetadataValue]] = None,
      schema: String = db.DefaultSchema,
      preprocessAction: String = "nopreprocessing",
      executionProvider: Option[String] = None): (Long, Long) = traced("AI.Upsert", name, schema) {
    validateSessionConfig(preprocessAction, executionProvider)
    val meta = aiMeta(name, schema)
    val im = Models.details(meta.indexModel.get)
    if (im.oneToMany)
      throw GraftException(s"Upsert is not supported for one-to-many model ${im.name}")
    newInput.foreach(i => requireKind(i, im, "Index"))
    val newKey = newInput.map(i => Embedders.forModel(im.name).embedOne(i).head)
    val valueWithOriginal = (newInput, meta.storeOriginal) match {
      case (Some(i), true) =>
        Some(newValue.getOrElse(Map.empty) + (ReservedKey -> i))
      case _ => newValue
    }
    recordSessionConfig(name, schema, preprocessAction, executionProvider)
    db.upsert(name, cond, newKey, valueWithOriginal, mergeMetadata = true, schema)
  }

  // -------------------------------------------------------------------- read

  /** AI GetSimN — embed the query with the QUERY model, delegate, then strip
    * the reserved key back out into an `input` column
    * (ai/src/server/handler.rs:339-420). */
  def getSimN(name: String, input: MetadataValue, closestN: Int,
      algorithm: Algorithm, condition: Option[PredicateCondition] = None,
      schema: String = db.DefaultSchema): DataFrame = traced("AI.GetSimN", name, schema) {
    val meta = aiMeta(name, schema)
    val qm = Models.details(meta.queryModel.get)
    requireKind(input, qm, "Query")
    // a one-to-many query model must yield EXACTLY one embedding for the
    // search input — zero is an embedding failure, several is ambiguous
    // (which face would we search for?) — ai/src/engine/store.rs:568-578
    // (ModelInputToEmbeddingError / MultipleEmbeddingsForQuery)
    val q = Embedders.forModel(qm.name).embedOne(input) match {
      case Seq(one) => one
      case Seq()    => throw GraftException(
        s"Query input produced no embeddings under model ${qm.name}")
      case many     => throw GraftException(
        s"Query input produced ${many.length} embeddings under model " +
          s"${qm.name}; GetSimN requires exactly one")
    }
    stripReserved(db.getSimN(name, q, closestN, algorithm, condition, schema))
  }

  /** AI GetKey — lookup by raw input via the reserved key (requires
    * STOREORIGINAL; ai/src/engine/store.rs:500-521). */
  def getKey(name: String, inputs: Seq[MetadataValue],
      schema: String = db.DefaultSchema): DataFrame = traced("AI.GetKey", name, schema) {
    requireStoreOriginal(name, schema, "GetKey")
    stripReserved(db.getPred(name,
      In(ReservedKey, inputs.toSet), schema))
  }

  /** AI DelKey — delete by raw input via the reserved key. */
  def delKey(name: String, inputs: Seq[MetadataValue],
      schema: String = db.DefaultSchema): Long = traced("AI.DelKey", name, schema) {
    requireStoreOriginal(name, schema, "DelKey")
    db.delPred(name, In(ReservedKey, inputs.toSet), schema)
  }

  /** AI GetPred — passthrough + reserved-key strip into `input`. */
  def getPred(name: String, cond: PredicateCondition,
      schema: String = db.DefaultSchema): DataFrame =
    traced("AI.GetPred", name, schema) { stripReserved(db.getPred(name, cond, schema)) }

  /** ConvertStoreInputToEmbeddings (protos/ai/query.proto:178-184):
    * standalone inputs × model → vectors. */
  def convertStoreInputToEmbeddings(inputs: Seq[MetadataValue],
      model: String): Seq[(MetadataValue, Array[Float])] =
    traced("AI.ConvertStoreInputToEmbeddings", model, db.DefaultSchema) {
    val m = Models.details(model)
    val embedder = Embedders.forModel(m.name)
    inputs.map(i => { requireKind(i, m, "Convert"); i -> embedder.embedOne(i).head })
  }

  /** DropPredIndex passthrough — the reserved key is retained
    * (operations.rs:276-278). */
  def dropPredIndex(name: String, keys: Set[String],
      errorIfNotExists: Boolean = true, schema: String = db.DefaultSchema): Int =
    db.dropPredIndex(name, keys - ReservedKey, errorIfNotExists, schema)

  // ---- remaining passthroughs (ai/src/engine/operations.rs: the AI service
  // mirrors every DB RPC; these delegate 1:1 so an AI client has the full
  // surface without reaching for the DB engine) ----
  def delPred(name: String, cond: PredicateCondition,
      schema: String = db.DefaultSchema): Long = db.delPred(name, cond, schema)
  def createPredIndex(name: String, keys: Set[String],
      schema: String = db.DefaultSchema): Int =
    db.createPredIndex(name, keys, schema)
  def createNonLinearIndex(name: String, configs: Seq[NonLinearConfig],
      schema: String = db.DefaultSchema): Int =
    db.createNonLinearIndex(name, configs, schema)
  def dropNonLinearIndex(name: String, kinds: Set[String],
      errorIfNotExists: Boolean = true, schema: String = db.DefaultSchema): Int =
    db.dropNonLinearIndex(name, kinds, errorIfNotExists, schema)
  def dropStore(name: String, schema: String = db.DefaultSchema,
      errorIfNotExists: Boolean = true): Int =
    db.dropStore(name, schema, errorIfNotExists)
  def dropSchema(schema: String, errorIfNotExists: Boolean = true): Int =
    db.dropSchema(schema, errorIfNotExists)
  def listStores(schema: String = db.DefaultSchema): Seq[graft.engine.StoreInfo] =
    db.listStores(schema)
  def getStore(name: String, schema: String = db.DefaultSchema): graft.engine.StoreInfo =
    db.getStore(name, schema)
  def purgeStores(): Int = db.purgeStores()
  def ping(): String = db.ping()
  def infoServer(): Map[String, String] = db.infoServer()
  def listClients(): Seq[Map[String, String]] = db.listClients()

  // ----------------------------------------------------------------- helpers

  private def requireStoreOriginal(name: String, schema: String, op: String): Unit =
    if (!db.storeMeta(name, schema).storeOriginal)
      throw GraftException(
        s"$op by input requires store to be created with STOREORIGINAL")

  private def requireKind(v: MetadataValue, m: ModelDetails, action: String): Unit =
    if (v.kind != m.inputKind)
      throw GraftException(
        s"$action model ${m.name} expects ${m.inputKind} input, got ${v.kind}")

  /** (key,value[,similarity]) → (input, value-without-reserved[,similarity]):
    * the reserved original moves back into the response key slot
    * (ai/src/engine/store.rs:523-529). */
  private def stripReserved(res: DataFrame): DataFrame = {
    val cols = Seq(
      element_at(col("value"), ReservedKey).as("input"),
      map_filter(col("value"), (k, _) => k =!= ReservedKey).as("value")) ++
      (if (res.columns.contains("similarity")) Seq(col("similarity")) else Nil)
    res.select(cols: _*)
  }

  private def metaToRow(v: MetadataValue): Row = v match {
    case MetadataValue.RawString(s) => Row("raw_string", s, null)
    case MetadataValue.Image(b)     => Row("image", null, b)
    case MetadataValue.Audio(b)     => Row("audio", null, b)
  }

  /** Driver-side entries → (input, value) DataFrame. */
  def inputsDf(entries: Seq[(MetadataValue, Map[String, MetadataValue])]): DataFrame = {
    val rows = entries.map { case (in, v) =>
      Row(metaToRow(in), v.map { case (k, vv) => k -> metaToRow(vv) })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), inputSchema)
  }
}

object AiEngine {
  /** Executor-side struct → MetadataValue (must live outside the class so
    * mapPartitions closures don't capture the engine; also the
    * streaming CDC ingest's delete-key decode —
    * [[graft.streaming.StreamingIngest.ingestAiCdcEntries]]). */
  private[graft] def rowToMeta(r: Row): MetadataValue = r.getString(0) match {
    case "raw_string" => MetadataValue.RawString(r.getString(1))
    case "image"      => MetadataValue.Image(r.getAs[Array[Byte]](2))
    case "audio"      => MetadataValue.Audio(r.getAs[Array[Byte]](2))
  }
}
