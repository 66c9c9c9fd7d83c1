package graft.ann

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ScaleRecall

/**
 * Sharp-filter slice-scan cost measurement (round-17): quantifies the
 * r16-advice fix to [[RoutedAnnIndex.scanSearch]] — the accept test now
 * runs on the ID before the stored vector materializes, so the ~rejected
 * fraction of rows no longer pays a per-row decode (a codebook gather
 * under PQ, plus an O(d²) rotate-back under OPQ — at serving dims the
 * rotate-back is ~2·d² flops/row, the dominant term by far).
 *
 * Two arms per storage kind, same JVM, same built index, interleaved:
 *  - OLD (the r16 shape, re-implemented here verbatim): iterate
 *    [[RoutedAnnIndex.rowsOf]] — which exports (decodes) EVERY stored
 *    row — then accept-test, with the query and Bloom filter captured in
 *    the task closure;
 *  - NEW (the shipped path): [[RoutedAnnIndex.scanSearch]] —
 *    [[RoutedAnnIndex.acceptedRowsOf]] decode-on-accept + broadcast
 *    query/filter.
 * Results are asserted IDENTICAL (same rows, same scores — the fix is
 * pure cost, zero semantics), so the wall-clock delta is attributable.
 *
 * This file lives in `graft.ann` (not `graft` like the other Scale
 * mains) because the OLD arm needs the package-private [[rowsOf]] to
 * reproduce the r16 loop exactly.
 *
 * Usage: runMain graft.ann.ScaleScan [n] [dim] [shards] [selectivityPct]
 *        (defaults 100000 768 32 5)
 */
object ScaleScan {

  private val K = 50
  private val NQ = 8

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(768)
    val shardsN = args.lift(2).map(_.toInt).getOrElse(32)
    val selPct = args.lift(3).map(_.toInt).getOrElse(5)
    val every = math.max(1, 100 / selPct)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val gen = new ScaleRecall.SiftGen(seed = 4242L, dim = dim, intrinsic = 12)
    val corpus = spark.range(n).map(i => (i, gen(i).toSeq)).toDF("id", "key")
      .select(col("id"), col("key").cast("array<float>").as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"corpus ${corpus.count()} x $dim, $shardsN shards, " +
      s"filter selectivity 1/$every")

    // the sharp filter: ids divisible by `every`, as the engine would
    // ship it — a Bloom sketch sized to the accept count
    val acceptedIds = corpus.select("id").where(col("id") % every === 0)
    val cnt = acceptedIds.count()
    val bloom = acceptedIds.stat.bloomFilter("id", cnt, 0.001)
    val filter = IdFilter.Bloom(bloom, cnt)
    println(s"accept set: $cnt ids, bloom ${bloom.bitSize() / 8 / 1024} KiB")

    val cfg = graft.types.NonLinearConfig.HNSWConfig(efConstruction = 100,
      maximumConnections = 40, maximumConnectionsZero = 80, efSearch = 128,
      metric = graft.types.Algorithm.CosineSimilarity)
    val qs = Array.tabulate(NQ)(i => gen(10000000L + i))

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label: $s%.2f s")
      s
    }

    /** The r16 scanSearch loop, verbatim shape: decode every stored row
      * (rowsOf), THEN accept-test; query + filter closure-captured. */
    def oldScan(idx: RoutedAnnIndex, q: Array[Float], k: Int,
        f: IdFilter): Seq[(Long, Double)] = {
      val accept: Long => Boolean =
        RoutedAnnIndex.composeAccept(idx.tombstones, f)
      val metric = idx.config.metric
      val kk = k
      val ord = Ordering.by[(Double, Long), (Double, Long)] {
        case (c, id) => (-c, id)
      }
      val local = idx.shards.mapPartitions { it =>
        val h = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
        it.foreach(shard => RoutedAnnIndex.rowsOf(shard).foreach { case (id, v) =>
          if (accept == null || accept(id)) {
            val e = (RoutedAnnIndex.closenessOf(metric, q, v), id)
            if (h.size < kk) h.enqueue(e)
            else if (ord.lt(e, h.head)) { h.dequeue(); h.enqueue(e) }
          }
        })
        h.iterator.map { case (c, id) => (id, c) }
      }.collect()
      local.groupBy(_._1)
        .map { case (id, xs) => (id, xs.map(_._2).max) }.toSeq
        .sortBy { case (id, c) => (-c, id) }.take(k)
    }

    for ((tag, storage) <- Seq(
        ("f32", StorageSpec.F32: StorageSpec),
        ("opq", StorageSpec.Opq(math.max(1, dim / 8), 256): StorageSpec))) {
      println(s"== $tag storage ==")
      val idx = RoutedAnnIndex.build(corpus, dim, cfg, shardsN, iters = 2,
        storage = storage)
      val slack = idx.storage.rescoreSlack
      // warm both paths once (JIT + shard materialization out of the walls)
      oldScan(idx, qs(0), K + slack, filter)
      idx.scanSearch(qs(0), K + slack, filter)
      // interleaved arms, identical-result assertion per query
      var tOld = 0.0; var tNew = 0.0
      qs.foreach { q =>
        var a: Seq[(Long, Double)] = null
        var b: Seq[(Long, Double)] = null
        tOld += timed("old (decode-all, closure-shipped)") {
          a = oldScan(idx, q, K + slack, filter)
        }
        tNew += timed("new (decode-on-accept, broadcast)") {
          b = idx.scanSearch(q, K + slack, filter)
        }
        require(a == b, s"arm results diverged — the fix must be pure cost")
      }
      println(f"$tag: old ${tOld / NQ}%.2f s/q, new ${tNew / NQ}%.2f s/q, " +
        f"speedup ${tOld / tNew}%.1fx (results identical)")
      idx.unpersist()
    }
    spark.stop()
  }
}
