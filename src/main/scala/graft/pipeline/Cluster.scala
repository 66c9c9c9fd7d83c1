package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.IvfIndex

/**
 * Embedding-space clustering for corpus curation — the SemDeDup / DCLM
 * shape: k-means over the document embeddings, then per-cluster balanced
 * selection so no single mode of the corpus dominates a training mix
 * (reference scope: similarity search over stored embeddings,
 * `ahnlich/ai/src/engine/ai/mod.rs`; clustering the same vectors for
 * curation is an extension the north-star brief asks for).
 *
 * Reuses the IVF coarse quantizer verbatim ([[graft.ann.IvfIndex.build]]):
 * the deterministic Lloyd loop (k smallest-id seeds, no RNG, assign =
 * ONE native-kernel argmin per row, update = groupBy-cell mean) IS
 * k-means — a cluster assignment and an IVF cell are the same object.
 * That identity is the scale story too: persisted cluster assignments are
 * the cell-partitioned IVF artifact ([[graft.ann.IvfIndex.save]]), so a
 * 100 TB corpus clusters once and every downstream op (balanced sampling,
 * per-cluster dedup, ANN probing) reads the same partition-pruned table.
 */
object Cluster {

  /** Deterministic seed centroids: the k smallest-id vectors, exactly
    * [[graft.ann.IvfIndex.build]]'s init (no RNG — the same corpus always
    * seeds the same centroids, which is what lets an external system
    * replay the assignment bit-for-bit). Driver-side k vectors only. */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Float]] = {
    require(k > 0, s"k must be positive, got $k")
    df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toArray)
  }

  /** Nearest-centroid assignment: ONE native-kernel argmin per row
    * (squared euclidean, strict-< first minimum — ties break toward the
    * lowest cluster index), appended as an INT `outCol`. Narrow map over
    * the corpus — no shuffle; the centroid table rides the kernel as a
    * single flat float[] reference. */
  def assign(df: DataFrame, vecCol: String,
      centroids: Array[Array[Float]], outCol: String = "cluster"): DataFrame =
    df.withColumn(outCol, IvfIndex.assignCell(col(vecCol), centroids))

  /** Full deterministic k-means: `iters` Lloyd rounds over (idCol, vecCol)
    * via the IVF builder, returning (centroids, assignments). The
    * assignments frame is (all input columns, cluster INT), cached and
    * repartitioned by cluster — downstream per-cluster ops (balanced
    * sample, per-cluster dedup) start co-located. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 3): (Array[Array[Float]], DataFrame) = {
    val keyed = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("key"))
    val index = IvfIndex.build(keyed, nCells = k, iters = iters)
    val assigned = index.cells.select(col("id").as(idCol),
      col("cell").as("cluster"))
    (index.centroids, assigned)
  }

  /** Embedding-space OUTLIER report — the vector-corpus hygiene filter
    * (the SemDeDup-adjacent "far from every mode" rule): per vector, its
    * assigned cluster, its squared distance to that cluster's centroid,
    * and an outlier flag raised when the squared distance exceeds
    * `factorNum/factorDen` × the CLUSTER's mean squared distance —
    * mislabeled points, embedding-model failures, and genuine
    * out-of-distribution documents all surface here before they poison a
    * training mix or an ANN build. Output: (idCol, cluster, dist2_e6,
    * n_cluster, is_outlier).
    *
    * Hash-robustness discipline (the datacard rule): the squared distance
    * ships as a ×10⁶ BIGINT from one 6dp rounding of the
    * deterministically-accumulated double (the same ascending-index fold
    * the assignment kernel uses, so any engine replays it); the flag is
    * an exact INTEGER cross-multiplication — dist2_e6 · n · factorDen >
    * factorNum · Σdist2_e6, evaluated in DECIMAL so no product can
    * overflow — never a floating mean. The mean itself is derivable
    * (sum/n) but deliberately not emitted as a double.
    *
    * Scale shape: ONE kernel projection per row (distances + argmin),
    * ONE cluster-bounded groupBy (map-side combined, k rows out), one
    * broadcast join back. No corpus-sized shuffle. */
  def embeddingOutliers(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], factorNum: Long = 4L,
      factorDen: Long = 1L): DataFrame = {
    require(centroids.nonEmpty, "embeddingOutliers needs centroids")
    require(factorNum > 0 && factorDen > 0,
      s"factor must be positive, got $factorNum/$factorDen")
    import org.apache.spark.sql.graftbridge.{CentroidDists, ColumnBridge}
    import graft.functions.GraftFunctions.bind
    val dists = ColumnBridge.column(CentroidDists(
      ColumnBridge.expression(col(vecCol)), centroids.flatten, centroids.length))
    val feats = df.select(
      col(idCol),
      IvfIndex.assignCell(col(vecCol), centroids).as("cluster"),
      bind(dists) { d =>
        // the Profile.embFeatures exactness pattern: one 6dp rounding
        // into DECIMAL, then an exact ×10⁶ to the integral value
        (round(element_at(d,
          IvfIndex.assignCell(col(vecCol), centroids) + 1), 6)
          .cast("decimal(18,6)") * lit(1000000)).cast("long")
      }.as("dist2_e6"))
    val stats = feats.groupBy("cluster")
      .agg(count(lit(1)).as("n_cluster"), sum(col("dist2_e6")).as("_sum_e6"))
    feats.join(broadcast(stats), Seq("cluster"))
      .select(col(idCol), col("cluster"), col("dist2_e6"), col("n_cluster"),
        (col("dist2_e6").cast("decimal(38,0)") * col("n_cluster") * factorDen >
          col("_sum_e6").cast("decimal(38,0)") * factorNum).as("is_outlier"))
  }

  /** Cluster-balanced selection: the `perCluster` rows with the smallest
    * md5(id) per cluster — the same deterministic-hash order every other
    * sampling op in this library uses ([[Corpus.deterministicSample]]), so
    * a balanced sample is reproducible from the ids alone, no RNG state.
    *
    * Scale shape: ONE hash-partitioned window per cluster. The partition
    * unit is the cluster — exactly like IVF cells — so callers pick k
    * large enough that corpus/k rows fit a task (curation runs use
    * thousands of clusters; a 100 TB corpus at k = 10,000 sorts ~10 GB
    * per task on the md5 key, and AQE splits stragglers). A global sort
    * or a collect never appears. */
  def balancedSample(df: DataFrame, clusterCol: String, idCol: String,
      perCluster: Int): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive, got $perCluster")
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_csel", row_number().over(w))
      .where(col("_csel") <= perCluster)
      .drop("_csel")
  }
}
