package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark
import graft.types._
import graft.types.MetadataValue.RawString
import graft.types.PredicateCondition._
import graft.dsl.{Pipeline, Response}

/** End-to-end scenarios transliterated from the reference's server test
  * corpus (/root/reference/ahnlich/db/src/tests/server_tests.rs:65-5337)
  * that the per-operator specs don't already pin. */
class E2eParitySpec extends AnyFunSuite {

  private def meta(kvs: (String, String)*): Map[String, MetadataValue] =
    kvs.map { case (k, v) => k -> (RawString(v): MetadataValue) }.toMap

  private def fresh() = new GraftEngine(spark)

  test("getSimN: predicate matching nothing returns empty, not an error (store.rs:318-320)") {
    val e = fresh()
    e.createStore("s", 2)
    e.setSeq("s", Seq((Array(1f, 1f), meta("k" -> "v"))))
    val out = e.getSimN("s", Array(1f, 1f), 5, Algorithm.CosineSimilarity,
      Some(Equals("k", RawString("nope"))))
    assert(out.count() == 0)
  }

  test("getSimN: closest_n larger than the store returns everything, ordered") {
    val e = fresh()
    e.createStore("s", 2)
    e.setSeq("s", Seq(
      (Array(1f, 0f), meta("i" -> "1")),
      (Array(0f, 1f), meta("i" -> "2")),
      (Array(1f, 1f), meta("i" -> "3"))))
    val out = e.getSimN("s", Array(1f, 0f), 100, Algorithm.CosineSimilarity).collect()
    assert(out.length == 3)
    val sims = out.map(_.getAs[Float]("similarity")).toSeq
    assert(sims == sims.sortBy(-_)) // descending similarity
  }

  test("dimension mismatches rejected across the read surface (store.rs:821-838)") {
    val e = fresh()
    e.createStore("s", 3)
    intercept[GraftException](e.getSimN("s", Array(1f, 2f), 1, Algorithm.CosineSimilarity))
    intercept[GraftException](e.getKey("s", Seq(Array(1f, 2f))))
    intercept[GraftException](e.delKey("s", Seq(Array(1f))))
    intercept[GraftException](e.upsert("s", Equals("k", RawString("v")),
      newKey = Some(Array(1f, 2f, 3f, 4f))))
  }

  test("getKey with unknown vectors returns empty; delKey returns 0") {
    val e = fresh()
    e.createStore("s", 2)
    e.setSeq("s", Seq((Array(1f, 1f), meta("k" -> "v"))))
    assert(e.getKey("s", Seq(Array(9f, 9f))).count() == 0)
    assert(e.delKey("s", Seq(Array(9f, 9f))) == 0)
    assert(e.storeDf("s").count() == 1)
  }

  test("schemas isolate same-named stores (server_tests.rs schema suite 4655-5040)") {
    val e = fresh()
    e.createStore("s", 1, schema = "t1")
    e.createStore("s", 2, schema = "t2")
    e.set("s", e.entriesDf(Seq((Array(1f), meta("where" -> "t1")))), "t1")
    e.set("s", e.entriesDf(Seq((Array(1f, 2f), meta("where" -> "t2")))), "t2")
    assert(e.getStore("s", "t1").dimension == 1)
    assert(e.getStore("s", "t2").dimension == 2)
    assert(e.getPred("s", Equals("where", RawString("t1")), "t1").count() == 1)
    assert(e.getPred("s", Equals("where", RawString("t2")), "t1").count() == 0)
    // dropping one schema leaves the other intact
    assert(e.dropSchema("t1") == 1)
    assert(e.getStore("s", "t2").len == 1)
  }

  test("upsert new key colliding with an existing entry keeps one row (store.rs:517-522)") {
    val e = fresh()
    e.createStore("s", 1)
    e.setSeq("s", Seq(
      (Array(1f), meta("k" -> "a")),
      (Array(2f), meta("k" -> "b"))))
    // move entry "a" onto vector [2.0] — collides with entry "b": last wins
    e.upsert("s", Equals("k", RawString("a")), newKey = Some(Array(2f)),
      newValue = Some(meta("k" -> "a")), mergeMetadata = true)
    assert(e.storeDf("s").count() == 1)
    val m = e.getKey("s", Seq(Array(2f))).collect().head
      .getMap[String, org.apache.spark.sql.Row](1)
    assert(m("k").getString(1) == "a")
  }

  test("DSL pipeline spanning schemas + search via index (handler loop parity)") {
    val e = fresh()
    val script =
      """CREATESTORE st DIMENSION 2 SCHEMA left;
        |CREATESTORE st DIMENSION 2 NONLINEARALGORITHMINDEX (kdtree) SCHEMA right;
        |SET (([1.0, 0.0], {side: l})) IN st SCHEMA left;
        |SET (([0.0, 1.0], {side: r}), ([9.0, 9.0], {side: far})) IN st SCHEMA right;
        |GETSIMN 1 WITH [0.0, 1.0] USING kdtree IN st SCHEMA right;
        |LISTSTORES SCHEMA right;
        |DROPSCHEMA left""".stripMargin
    val res = Pipeline.runDb(e, script)
    assert(res.forall(_.isRight), s"unexpected error in $res")
    res(4) match {
      case Right(Response.SimEntries(df)) =>
        val r = df.collect()
        assert(r.length == 1)
        assert(r.head.getMap[String, org.apache.spark.sql.Row](1)("side").getString(1) == "r")
        assert(r.head.getAs[Float]("similarity") == 0.0f) // squared distance
      case other => fail(s"unexpected $other")
    }
    res(5) match {
      case Right(Response.StoreList(infos)) =>
        assert(infos.map(_.name) == Seq("st") && infos.head.nonLinearIndexes == Seq("kdtree"))
      case other => fail(s"unexpected $other")
    }
  }

  test("set into an HNSW-indexed store serves through the index immediately") {
    val e = fresh()
    e.createStore("s", 4, nonLinearIndexes = Seq(NonLinearConfig.HNSWConfig()))
    e.setSeq("s", (0 until 30).map(i =>
      (Array(i.toFloat, 0f, 0f, 0f), meta("i" -> i.toString))))
    val out = e.getSimN("s", Array(7f, 0f, 0f, 0f), 1, Algorithm.HNSW).collect()
    assert(out.length == 1)
    assert(math.abs(out.head.getAs[Float]("similarity") - 1.0f) < 1e-6) // cosine self
  }
}
