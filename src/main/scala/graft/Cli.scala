package graft

import scala.io.StdIn

import org.apache.spark.sql.SparkSession

import graft.dsl.{Pipeline, Response}
import graft.engine.GraftEngine

/**
 * REPL / script runner — the analog of the reference CLI
 * (/root/reference/ahnlich/cli: DSL line → pipeline → responses), speaking
 * to an in-process engine instead of a gRPC server.
 *
 * Usage:
 *   sbt "runMain graft.Cli [--ai] [--persist DIR] [SCRIPT...]"
 *
 * Each SCRIPT argument (or, with none, each stdin line) is a `;`-separated
 * pipeline; per-statement results or errors print in order. `--ai` switches
 * to the AI grammar + engine (mock embedder runtime); `--persist DIR`
 * backs stores with the parquet catalog at DIR so sessions resume.
 */
object Cli {

  def render(r: Pipeline.StepResult): String = r match {
    case Left(err) => s"Error: $err"
    case Right(Response.Pong) => "PONG"
    case Right(Response.Ok) => "OK"
    case Right(Response.Count(n)) => s"count: $n"
    case Right(Response.SetResult(i, u)) => s"inserted: $i, updated: $u"
    case Right(Response.Info(f)) =>
      f.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("server: ", ", ", "")
    case Right(Response.Clients(cs)) => s"clients: ${cs.size}"
    case Right(Response.StoreList(infos)) =>
      if (infos.isEmpty) "stores: (none)"
      else infos.map(i => s"  ${i.schema}.${i.name} dim=${i.dimension} len=${i.len} " +
        s"pred=[${i.predicateIndexes.mkString(",")}] nl=[${i.nonLinearIndexes.mkString(",")}]")
        .mkString("stores:\n", "\n", "")
    case Right(Response.StoreGet(i)) =>
      s"store: ${i.schema}.${i.name} dim=${i.dimension} len=${i.len} " +
        s"pred=[${i.predicateIndexes.mkString(",")}] nl=[${i.nonLinearIndexes.mkString(",")}]"
    case Right(Response.Entries(df)) => renderRows(df, sim = false)
    case Right(Response.SimEntries(df)) => renderRows(df, sim = true)
  }

  /** Extension-statement results are plain relational frames (pairs,
    * chunks, vocab, ...) — no store (key, value) shape to pretty-print. */
  private def renderRelational(df: org.apache.spark.sql.DataFrame): String = {
    val rows = df.collect()
    if (rows.isEmpty) return "(0 rows)"
    s"(${rows.length} rows) [${df.columns.mkString(", ")}]\n" +
      rows.take(50).map(r => "  " + r.mkString("(", ", ", ")")).mkString("\n") +
      (if (rows.length > 50) s"\n  ... ${rows.length - 50} more" else "")
  }

  /** A frame is store-shaped only if its `value` column actually carries
    * the store map type (map<string, metadata-struct>). An --ext session
    * can SCAN arbitrary parquet, so a relational result that merely
    * *names* a column "value" (e.g. a string or long) must route to the
    * relational renderer — getMap on it would throw ClassCastException. */
  private def hasStoreValueColumn(df: org.apache.spark.sql.DataFrame): Boolean =
    df.schema.fields.find(_.name == "value").exists(_.dataType match {
      case org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        _: org.apache.spark.sql.types.StructType, _) => true
      case _ => false
    })

  private def renderRows(df: org.apache.spark.sql.DataFrame, sim: Boolean): String = {
    if (!hasStoreValueColumn(df)) return renderRelational(df)
    val rows = df.collect()
    if (rows.isEmpty) return "(0 rows)"
    val out = rows.map { row =>
      val keyIdx = row.schema.fieldNames.indexOf("key")
      val key = if (keyIdx >= 0 && !row.isNullAt(keyIdx))
        row.getSeq[Float](keyIdx).mkString("[", ", ", "]")
      else row.schema.fieldNames.indexOf("input") match {
        case i if i >= 0 && !row.isNullAt(i) =>
          val s = row.getStruct(i)
          if (s.getString(0) == "raw_string") s.getString(1)
          else s"<${s.getString(0)} ${Option(s.getAs[Array[Byte]](2)).fold(0)(_.length)}B>"
        case _ => "?"
      }
      val vIdx = row.schema.fieldNames.indexOf("value")
      val value = row.getMap[String, org.apache.spark.sql.Row](vIdx).toSeq
        .sortBy(_._1).map { case (k, v) =>
          if (v.getString(0) == "raw_string") s"$k: ${v.getString(1)}"
          else s"$k: <${v.getString(0)}>"
        }.mkString("{", ", ", "}")
      val simPart = if (sim) f", sim=${row.getAs[Float]("similarity")}%.4f" else ""
      s"  ($key, $value$simPart)"
    }
    s"(${rows.length} rows)\n" + out.mkString("\n")
  }

  private[graft] val Usage =
    "usage: graft.Cli [--ai | --ext] [--persist DIR] [SCRIPT...]"

  /** Argument parsing, separated for testability. `--persist` must be
    * followed by a directory that is not itself a flag — a bare trailing
    * `--persist` or `--persist --ai` is a usage error, not an AIOOBE. */
  private[graft] def parseArgs(args: Array[String]): (Boolean, Option[String], Seq[String]) = {
    val ai = args.contains("--ai")
    if (ai && args.contains("--ext"))
      throw new IllegalArgumentException(s"--ai and --ext are exclusive\n$Usage")
    if (args.count(_ == "--persist") > 1)
      throw new IllegalArgumentException(s"--persist given more than once\n$Usage")
    val persistIdx = args.indexOf("--persist")
    val persistRoot =
      if (persistIdx < 0) None
      else if (persistIdx + 1 >= args.length || args(persistIdx + 1).startsWith("--"))
        throw new IllegalArgumentException(s"--persist requires a directory argument\n$Usage")
      else Some(args(persistIdx + 1))
    args.find(a => a.startsWith("--") && a != "--ai" && a != "--ext" && a != "--persist")
      .foreach(a => throw new IllegalArgumentException(s"unknown flag $a\n$Usage"))
    val scripts = args.zipWithIndex.filterNot { case (a, i) =>
      a.startsWith("--") || (persistIdx >= 0 && i == persistIdx + 1) }.map(_._1).toSeq
    (ai, persistRoot, scripts)
  }

  def main(args: Array[String]): Unit = {
    val (ai, persistRoot, scripts) =
      try parseArgs(args)
      catch {
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage); sys.exit(2)
      }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = persistRoot.fold(new GraftEngine(spark))(r =>
      graft.engine.GraftEngine.load(spark, r))
    val aiEngine = new graft.ai.AiEngine(engine)

    val ext = args.contains("--ext")
    def run(script: String): Unit =
      try {
        val results =
          if (ext) Pipeline.runExt(spark, script)
          else if (ai) Pipeline.runAi(aiEngine, script)
          else Pipeline.runDb(engine, script)
        results.foreach(r => println(render(r)))
      } catch {
        case e: graft.dsl.DslParseError => println(s"Error: ${e.getMessage}")
      }

    if (scripts.nonEmpty) scripts.foreach(run)
    else {
      System.err.println(
        s"graft ${if (ext) "EXT" else if (ai) "AI" else "DB"} repl — `;`-separated statements, ctrl-D to exit")
      Iterator.continually(StdIn.readLine("graft> "))
        .takeWhile(l => l != null && l.trim != "exit")
        .filter(_.trim.nonEmpty)
        .foreach(run)
    }
    spark.stop()
  }
}
