package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Standing oracle-TYPING gate — the r11 lesson made permanent.
 *
 * DuckDB types any un-`CAST` integer `SUM(...)` (including window sums
 * and sums re-selected out of CTEs) as HUGEINT (int128 → Arrow
 * decimal128(38,0)), while the Spark side writes int64. Values compare
 * equal through any value-level check, so the driver's TYPE-SENSITIVE
 * hash was the only place the mismatch surfaced — and it cost three
 * rounds on five queries. This spec runs every `SparkEntry.oracleSql`
 * through DuckDB `DESCRIBE` (over the sf0.001 tables) and fails if any
 * output column falls outside the closed type set the engine emits:
 * {BIGINT, INTEGER, SMALLINT, TINYINT, DOUBLE, FLOAT, VARCHAR, BOOLEAN,
 * DATE, TIMESTAMP}. A deliberately un-cast SUM is checked as a negative
 * control so the gate itself is proven live, not assumed.
 */
class OracleTypingSpec extends AnyFunSuite {

  private val Allowed = Set("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP")

  private val SfDir = "/root/testdata/sf0.001"

  private def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** DESCRIBE every (name -> sql) in DuckDB; returns lines
    * `name|column|type` for each column whose type is NOT in [[Allowed]].
    * None when python3/duckdb is unavailable (the spec cancels). */
  private def offendingColumns(sqls: Map[String, String]): Option[Seq[String]] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-oracle-typing")
    val json = sqls.map { case (k, v) =>
      s"${jsonEscape(k)}: ${jsonEscape(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(dir.resolve("oracle.json"), json)
    val py =
      s"""import json, sys
         |try:
         |    import duckdb
         |except Exception:
         |    sys.exit(42)
         |allowed = ${Allowed.map(t => s"'$t'").mkString("{", ",", "}")}
         |con = duckdb.connect()
         |import os
         |for t in ("region nation customer supplier part orders lineitem "
         |          "events documents embeddings").split():
         |    p = os.path.join(${jsonEscape(SfDir)}, t + ".parquet")
         |    if os.path.exists(p):
         |        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
         |for name, sql in sorted(json.load(open(sys.argv[1])).items()):
         |    try:
         |        rows = con.execute("DESCRIBE (" + sql + ")").fetchall()
         |    except Exception as e:
         |        print(name + "|<describe-error>|" + str(e)[:120])
         |        continue
         |    for r in rows:
         |        base = r[1].split("(")[0].strip()
         |        if r[1] not in allowed and base not in allowed:
         |            print(name + "|" + r[0] + "|" + r[1])
         |""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("describe.py"), py)
    val pb = new ProcessBuilder("python3",
      dir.resolve("describe.py").toString, dir.resolve("oracle.json").toString)
    pb.redirectErrorStream(true)
    try {
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val rc = proc.waitFor()
      if (rc == 42) None // duckdb not importable here — cancel, don't fail
      else Some(out.linesIterator.filter(_.nonEmpty).toSeq)
    } catch {
      case _: java.io.IOException => None // no python3 on this machine
    }
  }

  test("every oracle's DESCRIBE schema stays inside the closed engine type set") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(SfDir)),
      s"$SfDir not present")
    val result = offendingColumns(SparkEntry.oracleSql)
    assume(result.isDefined, "python3 + duckdb unavailable — typing gate skipped")
    assert(result.get.isEmpty,
      "oracle output columns outside the closed type set (HUGEINT/DECIMAL " +
        "leak — add CAST(... AS BIGINT)):\n  " + result.get.mkString("\n  "))
  }

  test("negative control: a deliberately un-cast SUM is flagged") {
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(SfDir)),
      s"$SfDir not present")
    val result = offendingColumns(Map(
      "__control_bad__" -> "SELECT SUM(doc_id) AS s FROM documents",
      "__control_ok__" ->
        "SELECT CAST(SUM(doc_id) AS BIGINT) AS s FROM documents"))
    assume(result.isDefined, "python3 + duckdb unavailable — typing gate skipped")
    assert(result.get.exists(l =>
        l.startsWith("__control_bad__|s|") && l.endsWith("HUGEINT")),
      s"the gate failed to flag an un-cast SUM: ${result.get}")
    assert(!result.get.exists(_.startsWith("__control_ok__")),
      s"the gate flagged a properly cast SUM: ${result.get}")
  }
}
