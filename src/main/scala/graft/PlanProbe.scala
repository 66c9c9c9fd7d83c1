package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Measurement harness for the optimization rounds (guide §1: measure
 * first). For each named query it writes the formatted physical plan to
 * `plans/<tag>/<name>_<suffix>.txt` and prints a one-line job/stage/task
 * summary from a SparkListener — the plan-shape record the round's
 * before/after claims are checked against. Never part of the bench or the
 * driver contract; bench timings stay Bench's job.
 *
 * Usage: PlanProbe <suffix> <query[,query...]|all> [--run]
 *   suffix  e.g. "before" / "after" (files land in plans/$SPARK_GRAFT_PLAN_TAG, default r17)
 *   --run   also execute each query (toRdd.count, the bench's sink) and
 *           report wall seconds + job/stage/task counts.
 */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names0 = if (args.length > 1) args(1) else "all"
    val doRun = args.contains("--run")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r17")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries
    val names =
      if (names0 == "all") all.keys.toSeq.sorted
      else names0.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        .flatMap(p => if (p.endsWith("*"))
          all.keys.filter(_.startsWith(p.dropRight(1))).toSeq.sorted
        else Seq(p))

    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val verbose = args.contains("--jobs")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobWalls = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Double, String)]())
    val listener = new SparkListener {
      val jobDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        jobStart.put(j.jobId, System.nanoTime())
        // identity for the per-job report: the job description when set,
        // else the action's call site — the job-count analysis needs to
        // know WHICH actions a query runs, not just how many (r18)
        // a Trace span's description ("graft Op(store)") names the ENGINE
        // CALL — the identity the job-count analysis needs (run with
        // SPARK_GRAFT_TRACE=1); otherwise the stage call-site names the
        // action. The raw streaming-query description (an id block) says
        // nothing about which engine call ran the job.
        val prop = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        val desc = prop.filter(_.startsWith("graft "))
          .orElse(j.stageInfos.lastOption.map(_.name).filter(_.trim.nonEmpty))
          .orElse(prop)
          .getOrElse("")
        jobDesc.put(j.jobId, desc.linesIterator
          .find(_.trim.nonEmpty).getOrElse("").take(90))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(j.jobId)
        if (t0 != 0L) jobWalls.add((j.jobId,
          (System.nanoTime() - t0) / 1e9,
          Option(jobDesc.remove(j.jobId)).getOrElse("")))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // drain the async listener bus before sampling or resetting counters:
    // late events from the previous query otherwise bleed into the next
    // query's window (ADVICE r17)
    def drained(): Unit =
      org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)

    for (n <- names) {
      val fn = all(n)
      try {
        drained()
        jobs = 0; stages = 0; tasks = 0; jobWalls.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val buildS = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val exch = "(?m)^\\s*[+:]?[- ]*\\(?\\d*\\)?\\s*Exchange".r
          .findAllIn(plan).length
        java.nio.file.Files.write(dir.resolve(s"${n}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        drained()
        val (buildJobs, buildStages, buildTasks) = (jobs, stages, tasks)
        if (doRun) {
          jobs = 0; stages = 0; tasks = 0
          val t1 = System.nanoTime()
          df.queryExecution.toRdd.count()
          val runS = (System.nanoTime() - t1) / 1e9
          drained()
          println(f"$n%-36s build=$buildS%6.2fs (jobs=$buildJobs) " +
            f"run=$runS%6.2fs jobs=$jobs stages=$stages tasks=$tasks exch=$exch")
        } else
          println(f"$n%-36s build=$buildS%6.2fs (jobs=$buildJobs) exch=$exch")
        if (verbose) {
          import scala.jdk.CollectionConverters._
          jobWalls.asScala.toSeq.sortBy(-_._2).take(40).foreach { case (id, w, d) =>
            println(f"    job $id%3d  $w%6.2fs  $d")
          }
        }
      } catch {
        case e: Throwable =>
          println(s"$n FAILED: ${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    }
    spark.stop()
  }
}
