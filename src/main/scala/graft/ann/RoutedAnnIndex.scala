package graft.ann

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Similarity
import graft.types.NonLinearConfig

/**
 * Coarse-ROUTED sharded HNSW — the 100 TB read path for GetSimN-shaped
 * single-query search. The reference searches one HNSW graph on one node
 * (`ahnlich/similarity/src/hnsw/index.rs`); [[AnnIndex]] distributes that
 * as hash-sharded per-partition graphs, but hash shards are statistically
 * identical samples of the corpus, so EVERY query must fan out to EVERY
 * shard and per-query work grows linearly with shard count — fine at 16
 * shards, the open scale story at thousands.
 *
 * This index closes it by borrowing IVF's routing layer (the IVF-HNSW
 * composition of Jégou et al. 2011 §V / FAISS's IVF-with-HNSW-cells):
 * shard assignment is CONTENT-based — k-means centroids trained by the
 * same Lloyd loop as [[IvfIndex]] ([[IvfIndex.trainCentroids]], one code
 * path), each row lives in the shard of its nearest centroid, one HNSW
 * graph per shard. A query ranks the R centroids on the driver (R is
 * small; same `sqEuclidean` routing as [[IvfIndex.probeCells]] — the
 * assignment geometry) and searches only the `probes` nearest shards via
 * a partition-pruned job: per-query work is probes/R of the all-shard
 * fan-out, independent of R. probes = R is EXHAUSTIVE and equals the
 * all-shard merge (the correctness identity the oracle gate pins);
 * smaller probes trades recall for scan fraction exactly like IVF's
 * nProbe — the recall curve at 200k × 64 shards is measured in
 * ScaleRecall and recorded in SCALE.md.
 *
 * Mutation story — deliberately DIFFERENT from [[AnnIndex]]: content
 * routing cannot align with the persistence layer's id-hash buckets, so
 * this index has no delta-patch; like [[IvfIndex]] its maintenance is
 * periodic reclustering (centroids drift with the data — patching shards
 * against frozen centroids silently degrades recall). The hash-sharded
 * [[AnnIndex]] remains the engine's mutation-aligned index; build THIS
 * one over large, read-mostly corpora.
 */
final class RoutedAnnIndex(
    val centroids: Array[Array[Float]],
    val config: NonLinearConfig.HNSWConfig,
    val shards: RDD[AnnShard],
    val replicationEps: Double = 0.0,
    val iters: Int = 2,
    val maxReplicas: Int = 2,
    /** Build-time assignment objective: mean squared distance of build
      * rows to their assigned centroid — the drift baseline appends are
      * checked against (0 = unknown, every guard passes). */
    val meanAssignDist: Double = 0.0,
    /** Rows living in append overlays ([[PatchedShard]] tails) rather
      * than graphs — the compaction pressure gauge. */
    val patchedRows: Long = 0L) extends Serializable {

  def numShards: Int = centroids.length

  /** Batch k-NN JOIN through the routed shards — the both-sides-large
    * twin of the single-query [[search]] (and the graph-speed sibling of
    * [[IvfIndex.topKJoin]]'s cell scan): each query row is ranked against
    * the routing centroids ONCE (one native CentroidDists pass, the
    * assignment geometry), exploded to its `probes` nearest shards, and
    * the query rows — the SMALL side — are shuffled to the shard
    * partitions where the graphs already live; per partition each query
    * runs the shard's HNSW search. The corpus never moves, matched work
    * is |queries| × probes graph searches, and probes = numShards is the
    * exhaustive all-shard merge (the correctness identity; pruned probes
    * trade recall exactly like [[search]]). Returns (qid, cid, sim, rank)
    * ranked by closeness under the index metric, ties on cid — the
    * [[IvfIndex.topKJoin]] contract. */
  def topKJoin(queries: DataFrame, qId: String, qVec: String, k: Int,
      probes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftbridge.{CentroidDists, ColumnBridge}
    val spark = queries.sparkSession
    val p = math.max(1, math.min(probes, numShards))
    val q = queries.select(col(qId).cast("long").as("qid"),
        col(qVec).cast("array<float>").as("qv"))
      .groupBy("qid").agg(min(col("qv")).as("qv"))
    val dists = ColumnBridge.column(CentroidDists(
      ColumnBridge.expression(col("qv")), centroids.flatten, numShards))
    val ranked = slice(array_sort(zip_with(dists,
      sequence(lit(0), lit(numShards - 1)),
      (d, c) => struct(d.as("d"), c.as("c")))), 1, p)
    val routed = q.select(explode(ranked).as("_p"), col("qid"), col("qv"))
      .select(col("_p.c").cast("int").as("_s"), col("qid"), col("qv"))
    val byShard = routed
      .rdd.map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Float](2).toArray)))
      .partitionBy(new RoutedAnnIndex.ShardPartitioner(numShards))
      .mapPartitions(it => Iterator.single(it.map(_._2).toArray),
        preservesPartitioning = true)
    val hits = shards.zipPartitions(byShard, preservesPartitioning = false) {
      (sIt, qIt) =>
        val qs = qIt.next()
        sIt.toSeq.headOption match {
          case None => Iterator.empty
          case Some(shard) => qs.iterator.flatMap { case (qid, v) =>
            shard.topK(v, k, null).map { case (cid, c) => (qid, cid, c) }
          }
        }
    }
    import spark.implicits._
    val scored = hits.toDF("qid", "cid", "_closeness")
      // replicas can surface from several probed shards — keep one
      .groupBy("qid", "cid").agg(max(col("_closeness")).as("_closeness"))
    val w = Window.partitionBy("qid").orderBy(col("_closeness").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("cid"),
        round(col("_closeness").cast("float").cast("double"), 4).as("sim"),
        col("rank"))
  }

  /** Append rows WITHOUT reclustering: assign to the FROZEN centroids
    * (the training kernel), overlay each touched shard with an exact
    * brute-force tail ([[PatchedShard]]) — work ∝ batch size, the old
    * index stays valid until the new one is materialized, and appended
    * rows are scored exactly (never an approximation downgrade).
    *
    * Guards, both derived from the measured ScaleStaleness curve
    * (SCALE.md):
    *  - DRIFT: the batch's mean assignment distance exceeds
    *    `driftLimit` × the build-time objective — distribution shift is
    *    what decays frozen-centroid recall, so this returns None and the
    *    caller RECLUSTERS (fresh Lloyd over everything);
    *  - PATCH FRACTION: overlay rows would exceed `patchLimit` of the
    *    graph rows. Volume alone costs no recall (the measured in-dist
    *    rows), so this COMPACTS instead of refusing: each shard's graph
    *    is rebuilt locally from its own rows ∪ tails ∪ batch — no Lloyd,
    *    and NO shuffle of existing rows (assignments are frozen, rows
    *    never change shards) — the LSM memtable-flush analog. The
    *    compacted graph is bit-identical to one built over the union
    *    (id-ascending insertion both ways).
    * Rows already present (same id) are overlaid anyway — callers feed
    * genuinely-new ids (the engine's insert-only Set path does).
    * Under boundary replication (replicationEps > 0) appended rows are
    * SINGLE-assigned — they regain replica copies at the next recluster;
    * compaction rebuilds each shard locally, so existing replicas stay
    * where they are. */
  def append(dfIn: DataFrame,
      driftLimit: Double = RoutedAnnIndex.DefaultDriftLimit,
      patchLimit: Double = RoutedAnnIndex.DefaultPatchLimit): Option[RoutedAnnIndex] = {
    import org.apache.spark.sql.graftbridge.{CentroidDists, ColumnBridge}
    val df = dfIn.select(col("id").cast("long").as("id"), col("key"))
    val dists = ColumnBridge.column(CentroidDists(
      ColumnBridge.expression(col("key")), centroids.flatten, numShards))
    // one pass: per-row (nearest shard, min distance); agg gives the
    // batch objective and count, rows stay for the shard shuffle
    val assigned = df.select(
        IvfIndex.assignCell(col("key"), centroids).cast("int").as("_s"),
        array_min(dists).as("_d"), col("id"), col("key"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val agg = assigned.agg(count(lit(1)), avg(col("_d"))).head()
      val nNew = agg.getLong(0)
      if (nNew == 0) return Some(this)
      val batchObj = agg.getDouble(1)
      if (meanAssignDist > 0.0 && batchObj > driftLimit * meanAssignDist) {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          f"RoutedAnnIndex.append: drift guard tripped " +
            f"(batch objective $batchObj%.4f > $driftLimit%.1fx build " +
            f"$meanAssignDist%.4f) — recluster")
        return None
      }
      val graphRows = storedRows
      val compacting =
        graphRows > 0 && patchedRows + nNew > patchLimit * graphRows
      if (compacting)
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"RoutedAnnIndex.append: patch fraction ${patchedRows + nNew} " +
            s"overlay rows > $patchLimit of $graphRows graph rows — " +
            s"compacting (local per-shard graph rebuilds, no shuffle of " +
            s"existing rows, centroids frozen)")
      val metric = config.metric
      val cfg = config
      val dim = centroids.head.length
      val byShard = assigned
        .select(col("_s"), col("id"), col("key"))
        .rdd.map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Float](2).toArray)))
        .partitionBy(new RoutedAnnIndex.ShardPartitioner(numShards))
        .mapPartitions(it => Iterator.single(it.map(_._2).toArray.sortBy(_._1)),
          preservesPartitioning = true)
      val newShards = shards.zipPartitions(byShard, preservesPartitioning = true) {
        (sIt, aIt) =>
          val extra = aIt.next()
          val base = sIt.toSeq.headOption
          def rebuilt(rows: Iterator[(Long, Array[Float])]): AnnShard = {
            val idx = HnswIndex(dim, cfg)
            rows.toArray.sortBy(_._1).foreach { case (id, v) => idx.insert(id, v) }
            new HnswShard(idx, cfg.efSearch)
          }
          if (compacting) {
            val all = base.map(RoutedAnnIndex.rowsOf).getOrElse(Iterator.empty) ++
              extra.iterator
            if (all.isEmpty) Iterator.empty else Iterator(rebuilt(all))
          } else if (extra.isEmpty) base.iterator
          else base match {
            case Some(b) => Iterator(new PatchedShard(b, extra.map(_._1),
              extra.map(_._2), metric): AnnShard)
            case None => Iterator(rebuilt(extra.iterator)) // first rows here
          }
      }.persist(StorageLevel.MEMORY_AND_DISK)
      newShards.count() // materialize before releasing the predecessor
      shards.unpersist(blocking = false)
      Some(new RoutedAnnIndex(centroids, config, newShards, replicationEps,
        iters, maxReplicas, meanAssignDist,
        if (compacting) 0L else patchedRows + nNew))
    } finally assigned.unpersist(blocking = false)
  }

  /** Total rows stored across shard graphs — input rows × the boundary
    * replication factor (= input count exactly when replicationEps = 0).
    * Append overlays count their tails plus the wrapped graph. */
  def storedRows: Long = {
    def rows(s: AnnShard): Long = s match {
      case h: HnswShard => h.index.size.toLong
      case p: PatchedShard => p.extraRows.toLong + rows(p.base)
      case _ => 0L
    }
    shards.map(rows).sum().toLong
  }

  def unpersist(): Unit = shards.unpersist(blocking = false)

  /** Every stored (id, vector) row — graphs and overlay tails, deduped by
    * id (boundary replication stores copies). The extraction path for a
    * full recluster that has no other source of truth (e.g. streaming
    * ingest handles, [[graft.streaming.StreamingIngest.streamingRoutedAppend]]). */
  def rows: RDD[(Long, Array[Float])] =
    shards.flatMap(RoutedAnnIndex.rowsOf).reduceByKey((a, _) => a)

  /** The `probes` nearest shards for a query, by squared-Euclidean
    * distance to the routing centroids (the k-means assignment geometry,
    * ties toward the lower shard index — [[IvfIndex.probeCells]]'s rule). */
  def probeShards(q: Array[Float], probes: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (i, Similarity.jvm.sqEuclidean(q, c)) }
      .sortBy { case (i, d) => (d, i) }
      .take(math.max(1, math.min(probes, numShards)))
      .map(_._1)

  /** Merged top-k over the `probes` nearest shards only: one job on the
    * pruned partition set (never a full fan-out), then the same bounded
    * driver merge as [[AnnIndex.search]]. probes ≥ numShards ⇒ exhaustive.
    * With boundary replication a row can surface from several probed
    * shards (identical closeness — same stored vector); the merge
    * dedupes by id so replicas never occupy two result slots. */
  def search(q: Array[Float], k: Int, probes: Int,
      filter: IdFilter = null): Seq[(Long, Double)] = {
    val probe = probeShards(q, probes)
    val sc = shards.sparkContext
    val local = sc.runJob(shards, (it: Iterator[AnnShard]) => {
      val accept: Long => Boolean = if (filter == null) null else filter.accept _
      it.toSeq.flatMap(_.topK(q, k, accept))
    }, probe)
    local.flatten.groupBy(_._1)
      .map { case (id, xs) => (id, xs.map(_._2).max) }.toSeq
      .sortBy { case (id, c) => (-c, id) }.take(k)
  }
}

object RoutedAnnIndex {

  /** Append drift guard: recluster when an appended batch's mean
    * assignment distance exceeds this multiple of the build objective.
    * ScaleStaleness (SCALE.md): in-distribution batches sit at ~1.0x and
    * cost zero recall; the measured drifted regime (-4.4pt recall at 10%)
    * trips well above this. */
  val DefaultDriftLimit = 1.5

  /** Append patch-fraction guard: recluster when overlay tails would
    * exceed this fraction of graph rows (tails are exact brute force, so
    * recall only improves — this bounds their linear scan cost). */
  val DefaultPatchLimit = 0.25

  /** Stored (id, vector) rows of a routed shard — graphs and overlay
    * tails alike (the compaction extraction path). KD shards never occur
    * in a routed index (the build only grows HNSW graphs). */
  private def rowsOf(s: AnnShard): Iterator[(Long, Array[Float])] = s match {
    case h: HnswShard => h.index.entries
    case p: PatchedShard => rowsOf(p.base) ++ p.extraEntries
    case other => throw new IllegalStateException(
      s"routed shard of unexpected kind ${other.getClass.getSimpleName}")
  }

  /** Identity partitioner on the routed shard id (same shape as
    * AnnIndex's bucket partitioner, keyed by centroid assignment). */
  private final class ShardPartitioner(val n: Int)
      extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    override def equals(o: Any): Boolean = o match {
      case p: ShardPartitioner => p.n == n; case _ => false
    }
    override def hashCode: Int = n
  }

  // ------------------------------------------------------ artifact IO
  //
  // Same family policy as IvfIndex: the routing layer (centroids) is tiny
  // and driver-side, the shards are serialized per partition (the
  // AnnIndex layout). No delta patch — maintenance is periodic
  // reclustering, so staleness is all-or-nothing: any mismatch (config,
  // source stamp, centroid count) rebuilds WHOLE. Layout:
  //
  //   <dir>/routed_manifest.json  # config identity, sourceStamp,
  //                               # centroids as float INT BITS (exact)
  //   <dir>/s<i>.bin              # java-serialized AnnShard (absent = empty)

  def save(index: RoutedAnnIndex, dir: String, sourceStamp: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val present = index.shards.mapPartitionsWithIndex { (i, it) =>
      val target = java.nio.file.Paths.get(dir, s"s$i.bin")
      val shards = it.toArray
      if (shards.isEmpty) {
        java.nio.file.Files.deleteIfExists(target)
        Iterator.single(i -> false)
      } else {
        val attempt = Option(org.apache.spark.TaskContext.get())
          .fold(0L)(_.taskAttemptId())
        val tmp = target.resolveSibling(s"s$i.bin.tmp.$attempt")
        val os = new java.io.ObjectOutputStream(new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(tmp)))
        try os.writeObject(shards.head) finally os.close()
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Iterator.single(i -> true)
      }
    }.collect().toMap
    val json = JObject(
      "kind" -> JString("routed-hnsw"),
      "config" -> JString(index.config.toString),
      "replicationEps" -> JString(index.replicationEps.toString),
      "iters" -> JInt(index.iters),
      "maxReplicas" -> JInt(index.maxReplicas),
      // derived state (restored, not compared): exact double via long bits
      "meanAssignDist" -> JInt(BigInt(
        java.lang.Double.doubleToRawLongBits(index.meanAssignDist))),
      "patchedRows" -> JInt(BigInt(index.patchedRows)),
      "sourceStamp" -> JString(sourceStamp),
      "present" -> JArray((0 until index.numShards).toList.map(i =>
        JBool(present.getOrElse(i, false)))),
      "centroids" -> JArray(index.centroids.toList.map(c =>
        JArray(c.toList.map(f => JInt(BigInt(java.lang.Float.floatToRawIntBits(f))))))))
    val target = java.nio.file.Paths.get(dir, "routed_manifest.json")
    val tmp = target.resolveSibling("routed_manifest.json.tmp")
    java.nio.file.Files.writeString(tmp, JsonMethods.pretty(JsonMethods.render(json)))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Restore from artifacts: bit-identical centroids (int-bits round
    * trip) + per-partition shard deserialization, zero Lloyd rounds and
    * zero graph builds. None — caller rebuilds — on any mismatch or read
    * failure (derived state, never an error). */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String,
      config: NonLinearConfig.HNSWConfig, sourceStamp: String,
      replicationEps: Double = 0.0, iters: Int = 2,
      maxReplicas: Int = 2): Option[RoutedAnnIndex] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val p = java.nio.file.Paths.get(dir, "routed_manifest.json")
      if (!java.nio.file.Files.exists(p)) return None
      val j = JsonMethods.parse(java.nio.file.Files.readString(p))
      if ((j \ "kind") != JString("routed-hnsw")) return None
      if ((j \ "config") != JString(config.toString)) return None
      if ((j \ "replicationEps") != JString(replicationEps.toString)) return None
      // every build parameter participates in artifact identity — an
      // artifact built under a different Lloyd-round count or replica cap
      // is a DIFFERENT index even at identical eps (same "any mismatch
      // rebuilds WHOLE" policy as config/sourceStamp/centroid count)
      if ((j \ "iters") != JInt(iters)) return None
      if ((j \ "maxReplicas") != JInt(maxReplicas)) return None
      if ((j \ "sourceStamp") != JString(sourceStamp)) return None
      val centroids: Array[Array[Float]] = (j \ "centroids") match {
        case JArray(cs) => cs.map {
          case JArray(vs) => vs.map {
            case JInt(b) => java.lang.Float.intBitsToFloat(b.toInt)
            case _ => return None
          }.toArray
          case _ => return None
        }.toArray
        case _ => return None
      }
      if (centroids.isEmpty) return None
      val present: Set[Int] = (j \ "present") match {
        case JArray(bs) => bs.zipWithIndex.collect {
          case (JBool(true), i) => i }.toSet
        case _ => return None
      }
      val parts = centroids.length
      if (present.exists(i => i >= parts)) return None
      if (present.exists(i =>
          !java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s"s$i.bin"))))
        return None
      val loaded = spark.sparkContext
        .parallelize(0 until parts, parts)
        .mapPartitionsWithIndex { (i, _) =>
          if (!present.contains(i)) Iterator.empty
          else {
            val is = new java.io.ObjectInputStream(new java.io.BufferedInputStream(
              java.nio.file.Files.newInputStream(
                java.nio.file.Paths.get(dir, s"s$i.bin"))))
            try Iterator.single(is.readObject().asInstanceOf[AnnShard])
            finally is.close()
          }
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      loaded.count()
      val meanDist = (j \ "meanAssignDist") match {
        case JInt(b) => java.lang.Double.longBitsToDouble(b.toLong)
        case _ => 0.0
      }
      val patched = (j \ "patchedRows") match {
        case JInt(b) => b.toLong
        case _ => 0L
      }
      Some(new RoutedAnnIndex(centroids, config, loaded, replicationEps,
        iters, maxReplicas, meanDist, patched))
    } catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"RoutedAnnIndex.load($dir) failed — falling back to rebuild", e)
        None
    }

  /** Load if fresh, else build and save — the one-call form. A loaded
    * artifact whose shard count differs from the requested build config
    * is stale ([[IvfIndex.buildOrLoad]]'s rule). */
  def buildOrLoad(dfIn: DataFrame, dim: Int,
      config: NonLinearConfig.HNSWConfig, numShards: Int, dir: String,
      sourceStamp: String, iters: Int = 2, replicationEps: Double = 0.0,
      maxReplicas: Int = 2): RoutedAnnIndex =
    load(dfIn.sparkSession, dir, config, sourceStamp, replicationEps,
        iters, maxReplicas)
      .filter { idx =>
        val ok = idx.numShards == numShards
        if (!ok) idx.unpersist()
        ok
      }
      .getOrElse {
        val built = build(dfIn, dim, config, numShards, iters,
          replicationEps, maxReplicas)
        // best-effort: artifacts are derived state — an IO failure here
        // degrades the next restart to a rebuild, it never fails the
        // operation that built the index (GraftEngine's artifact policy)
        try save(built, dir, sourceStamp)
        catch {
          case scala.util.control.NonFatal(e) =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"RoutedAnnIndex artifact save to $dir failed", e)
        }
        built
      }

  /** Build over an (id LONG, key ARRAY<FLOAT>) frame: train `numShards`
    * routing centroids (`iters` Lloyd rounds — the [[IvfIndex]] loop),
    * assign every row to its nearest centroid's shard with the SAME
    * kernel the training used (assignments can't diverge from the
    * geometry), then one HNSW graph per shard, rows inserted in id order
    * (deterministic graphs, the [[AnnIndex]] discipline).
    *
    * `replicationEps` > 0 turns on BOUNDARY REPLICATION (the SPANN
    * closure rule, Chen et al. 2021 §4.2): a row is copied into every
    * shard (up to `maxReplicas`, nearest first) whose centroid is within
    * (1+eps) of its nearest centroid's distance — boundary rows, the
    * ones a small probe set misses, become reachable from BOTH their
    * adjacent shards. Storage grows by the measured replication factor
    * (logged at build; bounded by maxReplicas); search cost per probe is
    * unchanged and the merge dedupes by id. eps = 0 is exact
    * single-assignment (the [[IvfIndex.assignCell]] kernel, bit-identical
    * to the training geometry). */
  def build(dfIn: DataFrame, dim: Int, config: NonLinearConfig.HNSWConfig,
      numShards: Int, iters: Int = 2, replicationEps: Double = 0.0,
      maxReplicas: Int = 2): RoutedAnnIndex =
    build(dfIn, dim, config, numShards, iters, replicationEps, maxReplicas,
      frozenCentroids = None)

  /** Build variant taking PRE-TRAINED routing centroids (no Lloyd rounds):
    * the primitive behind the maintenance story — "append without
    * reclustering" is a shard rebuild of (old ∪ new) rows against the OLD
    * index's frozen centroids, and the recall decay of exactly that
    * configuration vs a full recluster is what [[graft.ScaleStaleness]]
    * measures to derive the recluster cadence. */
  def build(dfIn: DataFrame, dim: Int, config: NonLinearConfig.HNSWConfig,
      numShards: Int, iters: Int, replicationEps: Double,
      maxReplicas: Int,
      frozenCentroids: Option[Array[Array[Float]]]): RoutedAnnIndex = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(replicationEps >= 0.0, s"replicationEps must be >= 0, got $replicationEps")
    require(maxReplicas >= 1, s"maxReplicas must be >= 1, got $maxReplicas")
    frozenCentroids.foreach(c => require(c.length == numShards,
      s"frozen centroid count ${c.length} != numShards $numShards"))
    val df = dfIn.select(col("id").cast("long").as("id"), col("key"))
      .persist(StorageLevel.MEMORY_AND_DISK) // scanned per Lloyd round + once to build
    val centroids = frozenCentroids.getOrElse(
      IvfIndex.trainCentroids(df, numShards, iters))
    require(centroids.nonEmpty,
      "cannot build a routed index over an empty corpus (no routing " +
        "centroids can be trained — callers defer the build until data exists)")
    // assignment objective (mean squared distance to assigned centroid):
    // the drift baseline future appends are checked against
    val meanDist = {
      import org.apache.spark.sql.graftbridge.{CentroidDists, ColumnBridge}
      val dists = ColumnBridge.column(CentroidDists(
        ColumnBridge.expression(col("key")), centroids.flatten, numShards))
      val r = df.agg(avg(array_min(dists))).head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    val assigned =
      if (replicationEps <= 0.0)
        df.select(IvfIndex.assignCell(col("key"), centroids).cast("int").as("_s"),
          col("id"), col("key"))
      else {
        // rank every centroid per row (one native CentroidDists pass —
        // the cellRankExpr shape), keep the nearest maxReplicas whose
        // SQUARED distance is within (1+eps)² of the nearest's
        import org.apache.spark.sql.graftbridge.{CentroidDists, ColumnBridge}
        import graft.functions.GraftFunctions.bind
        val f = (1.0 + replicationEps) * (1.0 + replicationEps)
        val dists = ColumnBridge.column(CentroidDists(
          ColumnBridge.expression(col("key")), centroids.flatten, numShards))
        val ranked = slice(array_sort(zip_with(dists,
          sequence(lit(0), lit(numShards - 1)),
          (d, c) => struct(d.as("d"), c.as("c")))), 1, maxReplicas)
        val kept = bind(ranked) { r =>
          filter(r, x =>
            x.getField("d") <= element_at(r, 1).getField("d") * lit(f))
        }
        df.select(explode(kept).as("_p"), col("id"), col("key"))
          .select(col("_p.c").cast("int").as("_s"), col("id"), col("key"))
      }
    val shards = assigned
      .rdd.map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Float](2).toArray)))
      .partitionBy(new ShardPartitioner(numShards))
      .mapPartitions({ it =>
        val rows = it.map(_._2).toArray.sortBy(_._1)
        val idx = HnswIndex(dim, config)
        rows.foreach { case (id, v) => idx.insert(id, v) }
        if (idx.size == 0) Iterator.empty
        else Iterator(new HnswShard(idx, config.efSearch): AnnShard)
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    shards.count()
    if (replicationEps > 0.0) {
      val n = df.count()
      val stored = assigned.count()
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        f"RoutedAnnIndex boundary replication eps=$replicationEps%.2f: " +
          f"$stored rows stored for $n input (${stored.toDouble / math.max(1, n)}%.3fx)")
    }
    df.unpersist(blocking = false)
    new RoutedAnnIndex(centroids, config, shards, replicationEps, iters,
      maxReplicas, meanDist, patchedRows = 0L)
  }
}
