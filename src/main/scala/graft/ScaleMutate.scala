package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{GraftEngine, Persistence}
import graft.types.{MetadataValue, PredicateCondition}

/**
 * Bucket-level mutation cost at scale (VERDICT r10 #8): the bench's vdb
 * mutation numbers (~2 s at sf1) are BULK operations whose batch touches
 * every bucket — they say nothing about the case the hash-bucketed
 * persistence layer exists for: a SMALL mutation against a BIG store.
 * This main builds a 200k-row persisted store from the scale embeddings,
 * then measures Set / DelKey / Upsert batches confined to one content
 * bucket, recording wall time and — from the catalog's bucketPaths —
 * exactly how many of [[GraftEngine.NumBuckets]] buckets each mutation
 * rewrote. The 100 TB story this pins: write amplification is
 * (touched buckets / NumBuckets) × store size, not store size — and the
 * touched set follows the BATCH's content hashes, not the batch size.
 *
 * Usage: SPARK_GRAFT_SF_DIR=<scale dir> runMain graft.ScaleMutate
 */
object ScaleMutate {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-scale-mutate").toString
    val e = new GraftEngine(spark, Some(root))
    val nb = GraftEngine.NumBuckets

    def buckets(): Map[Int, String] = Persistence.readCatalog(root)
      .find(_.meta.name == "big").get.bucketPaths
    def timed[A](f: => A): (A, Double) = {
      val t = System.nanoTime(); val r = f; (r, (System.nanoTime() - t) / 1e9)
    }
    val rows = scala.collection.mutable.ArrayBuffer[String]()
    def report(op: String, batch: Long, before: Map[Int, String],
        wall: Double): Unit = {
      val after = buckets()
      val moved = (0 until nb).count(b => before.get(b) != after.get(b))
      rows += f"| $op | $batch | $moved/$nb | $wall%.2f |"
      println(rows.last)
    }

    e.createStore("big", 64)
    val entries = graft.queries.TestStores.embEntries(spark, sfDir)

    // ---- bulk load: every bucket written (the full-frame baseline) ----
    val b0 = buckets()
    val ((_, _), wLoad) = timed(e.set("big", entries))
    val n = e.storeDf("big").count()
    report(s"bulk Set (initial load, $n rows)", n, b0, wLoad)

    // ---- single-bucket Set: 100 new vectors whose content ids all hash
    // to bucket 3 (content id = xxhash64(key); candidates are rescaled
    // existing embeddings, filtered by their would-be bucket) ----
    val batch = entries.limit(20000)
      .select(transform(col("key"), x => (x * lit(1.5f)).cast("float")).as("key"),
        col("value"))
      .withColumn("_b", pmod(xxhash64(col("key")), lit(nb)))
      .where(col("_b") === 3).drop("_b")
      .limit(100)
      .persist()
    val batchN = batch.count()
    val b1 = buckets()
    val ((_, _), wSet) = timed(e.set("big", batch))
    report("Set, batch confined to 1 bucket", batchN, b1, wSet)

    // ---- single-bucket DelKey: 100 existing keys from bucket 5 ----
    val victims = e.storeDf("big")
      .where(pmod(col("id"), lit(nb)) === 5).limit(100)
      .select("key").collect().map(_.getSeq[Float](0).toArray).toSeq
    val b2 = buckets()
    val (deleted, wDel) = timed(e.delKey("big", victims))
    report("DelKey, keys confined to 1 bucket", deleted, b2, wDel)

    // ---- Upsert: one entry (touches the old id's and new id's buckets) ----
    val probeId = e.storeDf("big")
      .select(element_at(col("value"), "vec_id").getField("str").as("v"))
      .limit(1).collect().head.getString(0)
    val b3 = buckets()
    val (_, wUp) = timed(e.upsert("big",
      PredicateCondition.Equals("vec_id", MetadataValue.RawString(probeId)),
      newValue = Some(Map("touched" -> MetadataValue.RawString("1"))),
      mergeMetadata = true))
    report("Upsert, single entry", 1, b3, wUp)

    println()
    println(s"| operation | batch rows | buckets rewritten | wall s |")
    println(s"|---|---|---|---|")
    rows.foreach(println)
    e.purgeStores()
    Persistence.deleteDir(root)
    spark.stop()
  }
}
