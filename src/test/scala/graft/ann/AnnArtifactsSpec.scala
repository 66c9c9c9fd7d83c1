package graft.ann

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures._
import graft.types.{Algorithm, NonLinearConfig}

/**
 * Serialized ANN shard artifacts ([[AnnIndex.save]]/[[AnnIndex.load]]):
 * restart must restore the EXACT graphs it saved (the build is
 * deterministic, so equality of search results over many probes is the
 * contract), stale shards (bucket mutated since the save) must delta-patch
 * while fresh shards deserialize, and unusable artifacts (config change,
 * missing manifest) must fall back to a rebuild, never fail.
 * Reference analog: non-linear indexes ride the persistence image
 * (ahnlich/utils/src/persistence.rs; SURVEY §2.4 "binary files next to the
 * table").
 */
class AnnArtifactsSpec extends AnyFunSuite {

  private val N = 3000
  private val Dim = 32
  private val Shards = 16 // == GraftEngine.NumBuckets at test scale
  private val K = 10
  private val NQueries = 25

  private lazy val (ids, vecs, gen) = siftLikeDataset(seed = 777L, n = N, dim = Dim)
  private lazy val queries: Array[Array[Float]] =
    Array.tabulate(NQueries)(i => gen((N + i).toLong))

  private val cfg = NonLinearConfig.HNSWConfig(efConstruction = 60,
    maximumConnections = 16, maximumConnectionsZero = 32,
    efSearch = 32, metric = Algorithm.CosineSimilarity)

  private def toDf(ids: Array[Long], vecs: Array[Array[Float]]) = {
    val s = spark
    import s.implicits._
    ids.indices.map(i => (ids(i), vecs(i).toSeq)).toDF("id", "key")
  }

  private def searchAll(index: AnnIndex): Seq[Seq[(Long, Double)]] =
    queries.toSeq.map(q => index.search(q, K))

  // fabricated persistence stamps: bucket b lives at "v1/_b=b"
  private def stamps(v: Int = 1): Map[Int, String] =
    (0 until Shards).map(b => b -> s"v$v/_b=$b").toMap

  private def tmpDir(): String =
    Files.createTempDirectory("graft-ann-artifacts").toString

  test("save/load round-trip restores identical graphs (zero build shuffles)") {
    val df = toDf(ids, vecs)
    val built = AnnIndex.build(df, Dim, cfg, numShards = Some(Shards))
    val expected = searchAll(built)
    val dir = tmpDir()
    AnnIndex.save(built, dir, stamps())

    // all stamps current -> every shard deserializes; the restore must not
    // run ANY multi-stage (shuffle) job — a graph build shuffles keyedRows
    val stageCounts = scala.collection.mutable.ArrayBuffer[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        stageCounts.synchronized { stageCounts += s.stageInfos.size }
    }
    spark.sparkContext.addSparkListener(listener)
    val loaded = try {
      val l = AnnIndex.load(spark, dir, cfg, stamps(), df, Dim)
      spark.sparkContext.parallelize(Seq(1), 1).count() // listener flush marker
      val deadline = System.nanoTime() + 10_000_000_000L
      while (stageCounts.synchronized(stageCounts.isEmpty) &&
        System.nanoTime() < deadline) Thread.sleep(10)
      l
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(loaded.isDefined, "artifacts did not load")
    assert(stageCounts.synchronized(stageCounts.forall(_ == 1)),
      s"restore ran a shuffle job (stage counts: $stageCounts)")
    assert(searchAll(loaded.get) == expected,
      "restored index diverges from the saved one")
    loaded.get.unpersist(); built.unpersist()
  }

  test("stale shards delta-patch on load; fresh shards keep their graphs") {
    val df = toDf(ids, vecs)
    val built = AnnIndex.build(df, Dim, cfg, numShards = Some(Shards))
    val dir = tmpDir()
    AnnIndex.save(built, dir, stamps())
    // "mutation": bucket 3's rows halve and its stamp moves to v2
    val keep: ((Long, Int)) => Boolean = { case (id, b) => b != 3 || id % 2 == 0 }
    val newIds = ids.filter(id => keep((id, (id % Shards).toInt)))
    val newVecs = ids.indices.filter(i => keep((ids(i), (ids(i) % Shards).toInt)))
      .map(vecs(_)).toArray
    val newDf = toDf(newIds, newVecs)
    val newStamps = stamps() + (3 -> "v2/_b=3")
    val loaded = AnnIndex.load(spark, dir, cfg, newStamps, newDf, Dim)
    assert(loaded.isDefined)
    // must equal a from-scratch build on the mutated corpus (both paths are
    // deterministic per shard, and only shard 3 changed)
    val rebuilt = AnnIndex.build(newDf, Dim, cfg, numShards = Some(Shards))
    assert(searchAll(loaded.get) == searchAll(rebuilt))
    // self-heal: the patched artifacts are now current — a second load with
    // the same stamps deserializes everything (and agrees)
    val again = AnnIndex.load(spark, dir, cfg, newStamps, newDf, Dim)
    assert(again.isDefined && searchAll(again.get) == searchAll(rebuilt))
    Seq(loaded, again).foreach(_.get.unpersist()); rebuilt.unpersist(); built.unpersist()
  }

  test("config change / missing manifest fall back to None (rebuild)") {
    val df = toDf(ids, vecs)
    val built = AnnIndex.build(df, Dim, cfg, numShards = Some(Shards))
    val dir = tmpDir()
    AnnIndex.save(built, dir, stamps())
    val other = cfg.copy(maximumConnections = 8)
    assert(AnnIndex.load(spark, dir, other, stamps(), df, Dim).isEmpty,
      "a changed config must invalidate the artifacts")
    assert(AnnIndex.load(spark, tmpDir(), cfg, stamps(), df, Dim).isEmpty,
      "no manifest must mean no restore")
    // corrupted shard file: stamp says present, bytes are garbage -> the
    // whole load degrades to a rebuild signal, never an exception
    Files.write(Paths.get(dir, "s5.bin"), Array[Byte](1, 2, 3))
    assert(AnnIndex.load(spark, dir, cfg, stamps(), df, Dim).isEmpty,
      "corrupt artifacts must fall back to rebuild")
    built.unpersist()
  }

  test("IVF artifacts: bit-identical restore, stamp staleness, corrupt fallback") {
    val df = toDf(ids, vecs)
    val built = IvfIndex.build(df, nCells = 8, iters = 2)
    val dir = tmpDir()
    IvfIndex.save(built, dir, sourceStamp = "v1")

    // restore: centroids must be BIT-identical (intBits round-trip), so
    // probe routing and cell assignment can never diverge from the build
    val loaded = IvfIndex.load(spark, dir, built.metric, "v1")
    assert(loaded.isDefined, "fresh stamp must restore")
    assert(loaded.get.centroids.length == built.centroids.length)
    loaded.get.centroids.zip(built.centroids).foreach { case (a, b) =>
      assert(a.map(java.lang.Float.floatToRawIntBits).toSeq ==
        b.map(java.lang.Float.floatToRawIntBits).toSeq,
        "centroids must round-trip bit-exactly")
    }
    // identical search results through the restored cell-partitioned
    // parquet (exhaustive probe => exact, so equality is the contract)
    queries.take(5).foreach { q =>
      def hits(ix: IvfIndex) = ix.search(q, K, nProbe = 8).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Float]("similarity"))).toSeq
      assert(hits(built) == hits(loaded.get),
        "restored index must answer identically")
    }

    // staleness: a different source stamp or metric means None (rebuild)
    assert(IvfIndex.load(spark, dir, built.metric, "v2").isEmpty,
      "a mutated source must invalidate the artifacts")
    assert(IvfIndex.load(spark, dir, Algorithm.CosineSimilarity, "v1").isEmpty,
      "a different metric must invalidate the artifacts")
    assert(IvfIndex.load(spark, tmpDir(), built.metric, "v1").isEmpty,
      "no manifest must mean no restore")

    // buildOrLoad: second call restores (bit-equal centroids), no retrain
    val viaBuildOrLoad = IvfIndex.buildOrLoad(df, 8, dir, "v1", iters = 2)
    assert(viaBuildOrLoad.centroids.map(_.toSeq).toSeq ==
      built.centroids.map(_.toSeq).toSeq)

    // corrupt manifest: fall back to rebuild, never an exception
    Files.writeString(Paths.get(dir, "ivf_manifest.json"), "{not json")
    assert(IvfIndex.load(spark, dir, built.metric, "v1").isEmpty,
      "corrupt manifest must fall back to rebuild")

    Seq(Some(built), loaded, Some(viaBuildOrLoad)).flatten.foreach(_.unpersist())
  }
}
