package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark
import graft.dsl.{Pipeline, Response}
import graft.engine.GraftEngine

/** CLI rendering of pipeline responses (reference analog: the REPL's
  * response formatting, ahnlich/cli). */
class CliSpec extends AnyFunSuite {

  test("render covers every response shape") {
    val e = new GraftEngine(spark)
    val script =
      """CREATESTORE clistore DIMENSION 2 PREDICATES (tag);
        |SET (([1.0, 2.0], {tag: a})) IN clistore;
        |GETSIMN 1 WITH [1.0, 2.0] USING cosinesimilarity IN clistore;
        |GETPRED (tag = a) IN clistore;
        |GETPRED (tag = zz) IN clistore;
        |LISTSTORES;
        |GETSTORE clistore;
        |DELKEY ([1.0, 2.0]) IN clistore;
        |PING;
        |INFOSERVER;
        |LISTCLIENTS;
        |DROPSTORE clistore""".stripMargin
    val rendered = Pipeline.runDb(e, script).map(Cli.render)
    assert(rendered(0) == "OK")
    assert(rendered(1) == "inserted: 1, updated: 0")
    assert(rendered(2).contains("[1.0, 2.0]") && rendered(2).contains("sim=1.0000"))
    assert(rendered(3).contains("{tag: a}"))
    assert(rendered(4) == "(0 rows)")
    assert(rendered(5).contains("public.clistore dim=2 len=1"))
    assert(rendered(6).startsWith("store: public.clistore"))
    assert(rendered(7) == "count: 1")
    assert(rendered(8) == "PONG")
    assert(rendered(9).startsWith("server: "))
    assert(rendered(10) == "clients: 1")
    assert(rendered(11) == "count: 1")
  }

  test("relational frame with a column named 'value' renders relationally") {
    import spark.implicits._
    // an --ext SCAN can surface arbitrary parquet; a string/long column
    // that merely NAMES itself "value" must not route into the store
    // renderer (which getMaps it and would throw ClassCastException)
    val df = Seq((1L, "hello"), (2L, "world")).toDF("id", "value")
    val out = Cli.render(Right(Response.Entries(df)))
    assert(out.contains("(2 rows)") && out.contains("hello"), out)
  }

  test("errors render per-statement without aborting the pipeline") {
    val e = new GraftEngine(spark)
    val out = Pipeline.runDb(e, "GETPRED (a = b) IN missing; PING").map(Cli.render)
    assert(out(0).startsWith("Error: Store missing not found"))
    assert(out(1) == "PONG")
  }

  test("--persist argument validation: trailing flag, flag-as-dir, unknown flag") {
    // well-formed
    assert(Cli.parseArgs(Array("--ai", "--persist", "/tmp/x", "PING")) ==
      ((true, Some("/tmp/x"), Seq("PING"))))
    assert(Cli.parseArgs(Array("PING; LISTSTORES")) ==
      ((false, None, Seq("PING; LISTSTORES"))))
    // --persist as the last argument must not AIOOBE
    val e1 = intercept[IllegalArgumentException](Cli.parseArgs(Array("--persist")))
    assert(e1.getMessage.contains("--persist requires a directory"))
    // --persist --ai must not eat --ai as the directory
    val e2 = intercept[IllegalArgumentException](Cli.parseArgs(Array("--persist", "--ai")))
    assert(e2.getMessage.contains("--persist requires a directory"))
    // unknown flags are rejected with usage, not silently ignored
    val e3 = intercept[IllegalArgumentException](Cli.parseArgs(Array("--bogus", "PING")))
    assert(e3.getMessage.contains("unknown flag --bogus"))
  }
}
