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
    val shards: RDD[AnnShard]) extends Serializable {

  def numShards: Int = centroids.length

  def unpersist(): Unit = shards.unpersist(blocking = false)

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
    * driver merge as [[AnnIndex.search]]. probes ≥ numShards ⇒ exhaustive. */
  def search(q: Array[Float], k: Int, probes: Int,
      filter: IdFilter = null): Seq[(Long, Double)] = {
    val probe = probeShards(q, probes)
    val sc = shards.sparkContext
    val local = sc.runJob(shards, (it: Iterator[AnnShard]) => {
      val accept: Long => Boolean = if (filter == null) null else filter.accept _
      it.toSeq.flatMap(_.topK(q, k, accept))
    }, probe)
    local.flatten.sortBy { case (id, c) => (-c, id) }.take(k).toSeq
  }
}

object RoutedAnnIndex {

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

  /** Build over an (id LONG, key ARRAY<FLOAT>) frame: train `numShards`
    * routing centroids (`iters` Lloyd rounds — the [[IvfIndex]] loop),
    * assign every row to its nearest centroid's shard with the SAME
    * kernel the training used (assignments can't diverge from the
    * geometry), then one HNSW graph per shard, rows inserted in id order
    * (deterministic graphs, the [[AnnIndex]] discipline). */
  def build(dfIn: DataFrame, dim: Int, config: NonLinearConfig.HNSWConfig,
      numShards: Int, iters: Int = 2): RoutedAnnIndex = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val df = dfIn.select(col("id").cast("long").as("id"), col("key"))
      .persist(StorageLevel.MEMORY_AND_DISK) // scanned per Lloyd round + once to build
    val centroids = IvfIndex.trainCentroids(df, numShards, iters)
    val shards = df
      .select(IvfIndex.assignCell(col("key"), centroids).cast("int").as("_s"),
        col("id"), col("key"))
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
    df.unpersist(blocking = false)
    new RoutedAnnIndex(centroids, config, shards)
  }
}
