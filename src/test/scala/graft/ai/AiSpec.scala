package graft.ai

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark
import graft.engine.GraftEngine
import graft.types._
import graft.types.MetadataValue.{Image, RawString}
import graft.types.PredicateCondition._

/** AI-proxy semantics transliterated from the reference's aiproxy suite
  * (/root/reference/ahnlich/ai/src/tests/aiproxy_test.rs + per-model
  * suites), with the deterministic mock embedder standing in for ONNX. */
class AiSpec extends AnyFunSuite {

  private def meta(kvs: (String, String)*): Map[String, MetadataValue] =
    kvs.map { case (k, v) => k -> (RawString(v): MetadataValue) }.toMap

  private def fresh() = new AiEngine(new GraftEngine(spark))

  test("createStore: dimension from index model, reserved predicates, dim-mismatch rejected") {
    val ai = fresh()
    intercept[GraftException](
      ai.createStore("s", "all-minilm-l6-v2", "bge-base-en-v1.5")) // 384 vs 768
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l12-v2",
      predicates = Set("tag"), storeOriginal = true)
    val info = ai.db.getStore("s")
    assert(info.dimension == 384)
    assert(info.predicateIndexes.contains(ai.ReservedKey))
    intercept[GraftException](ai.createStore("nope", "fake-model", "fake-model"))
  }

  test("set + getKey by raw input round-trip (store_original)") {
    val ai = fresh()
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2", storeOriginal = true)
    val (i1, u1) = ai.set("s", Seq(
      (RawString("hello world"), meta("tag" -> "a")),
      (RawString("goodbye"), meta("tag" -> "b"))))
    assert((i1, u1) == (2L, 0L))
    val got = ai.getKey("s", Seq(RawString("hello world"))).collect()
    assert(got.length == 1)
    assert(got.head.getStruct(0).getString(1) == "hello world") // input column
    val m = got.head.getMap[String, org.apache.spark.sql.Row](1)
    assert(m("tag").getString(1) == "a")
    assert(!m.contains(ai.ReservedKey)) // reserved key stripped from response
  }

  test("set validates input type against the index model") {
    val ai = fresh()
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2")
    val ex = intercept[GraftException](
      ai.set("s", Seq((Image(Array[Byte](1, 2)), meta("t" -> "x")))))
    assert(ex.msg.contains("raw_string"))
  }

  test("user metadata may not contain the reserved key") {
    val ai = fresh()
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2", storeOriginal = true)
    intercept[GraftException](ai.set("s", Seq(
      (RawString("x"), Map(ai.ReservedKey -> (RawString("evil"): MetadataValue))))))
  }

  test("getSimN: self-query is top-1 with cosine similarity 1.0, input restored") {
    val ai = fresh()
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2", storeOriginal = true)
    ai.set("s", Seq(
      (RawString("alpha"), meta("i" -> "1")),
      (RawString("beta"), meta("i" -> "2")),
      (RawString("gamma"), meta("i" -> "3"))))
    val top = ai.getSimN("s", RawString("beta"), 1, Algorithm.CosineSimilarity).collect()
    assert(top.length == 1)
    assert(top.head.getStruct(0).getString(1) == "beta")
    assert(math.abs(top.head.getAs[Float]("similarity") - 1.0f) < 1e-5)
    // query-type validation uses the QUERY model
    intercept[GraftException](
      ai.getSimN("s", Image(Array[Byte](1)), 1, Algorithm.CosineSimilarity))
  }

  test("re-set of the same input deletes stale entries first (DelPred+Set composite)") {
    val ai = fresh()
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2", storeOriginal = true)
    assert(ai.set("s", Seq((RawString("doc"), meta("v" -> "1")))) == ((1L, 0L)))
    // delete-first counting (operations.rs:229-266): the re-ingested input
    // is deleted before the set sees the store, so it reports as INSERTED —
    // (0, 1) here would mean the composite degraded to a plain overwrite
    assert(ai.set("s", Seq((RawString("doc"), meta("v" -> "2")))) == ((1L, 0L)))
    assert(ai.db.storeDf("s").count() == 1)
    assert(ai.db.storeLen("s") == 1)
    val got = ai.getKey("s", Seq(RawString("doc"))).collect()
    assert(got.head.getMap[String, org.apache.spark.sql.Row](1)("v").getString(1) == "2")
    // mixed batch against a 1-row store: "doc" re-ingests (delete-first →
    // inserted), "new" is a true insert — updated must stay 0 and the
    // store length must account for the stale delete
    assert(ai.set("s", Seq(
      (RawString("doc"), meta("v" -> "3")),
      (RawString("new"), meta("v" -> "1")))) == ((2L, 0L)))
    assert(ai.db.storeLen("s") == 2)
  }

  test("one-to-many model expands one input into 1+(len mod 3) indexed entries; delKey removes all") {
    val ai = fresh()
    ai.createStore("faces", "buffalo-l", "buffalo-l", storeOriginal = true)
    assert(ai.db.getStore("faces").predicateIndexes.contains(ai.OneToManyKey))
    val img4 = Image(Array[Byte](1, 2, 3, 4)) // len 4 -> 1 + (4 % 3) = 2 faces
    val img3 = Image(Array[Byte](5, 6, 7))    // len 3 -> 1 + (3 % 3) = 1 face
    val (ins, _) = ai.set("faces", Seq(
      (img4, meta("who" -> "a")), (img3, meta("who" -> "b"))))
    assert(ins == 3) // 2 + 1 expanded entries
    val idx = ai.getKey("faces", Seq(img4)).collect()
      .map(_.getMap[String, org.apache.spark.sql.Row](1)(ai.OneToManyKey).getString(1))
      .sorted.toSeq
    assert(idx == Seq("0", "1"))
    assert(ai.delKey("faces", Seq(img4)) == 2)
    assert(ai.db.storeDf("faces").count() == 1)
    // upsert rejected for one-to-many models
    intercept[GraftException](ai.upsert("faces",
      Equals("who", RawString("b")), Some(img3)))
  }

  test("one-to-many query model: getSimN needs exactly one embedding (sface_yunet_test.rs:406)") {
    val ai = fresh()
    ai.createStore("faces", "buffalo-l", "buffalo-l", storeOriginal = true)
    ai.set("faces", Seq((Image(Array[Byte](5, 6, 7)), meta("who" -> "b"))))
    // 3-byte image → 1 + (3 % 3) = 1 face: a valid query
    val ok = ai.getSimN("faces", Image(Array[Byte](9, 9, 9)), 1,
      Algorithm.CosineSimilarity).collect()
    assert(ok.length == 1)
    // 4-byte image → 2 faces: ambiguous query, rejected with the count
    val err = intercept[GraftException](ai.getSimN("faces",
      Image(Array[Byte](1, 2, 3, 4)), 1, Algorithm.CosineSimilarity))
    assert(err.getMessage.contains("2 embeddings"))
  }

  test("getKey/delKey by raw input require STOREORIGINAL (aiproxy_test.rs:296)") {
    val ai = fresh()
    ai.createStore("noorig", "all-minilm-l6-v2", "all-minilm-l6-v2") // no original
    ai.set("noorig", Seq((RawString("doc"), meta("v" -> "1"))))
    val e1 = intercept[GraftException](ai.getKey("noorig", Seq(RawString("doc"))))
    assert(e1.getMessage.contains("STOREORIGINAL"))
    val e2 = intercept[GraftException](ai.delKey("noorig", Seq(RawString("doc"))))
    assert(e2.getMessage.contains("STOREORIGINAL"))
  }

  test("one-to-many expansion counts UTF-8 BYTES, not chars (non-ASCII input)") {
    val ai = fresh()
    ai.createStore("nfaces", "buffalo-l", "buffalo-l", storeOriginal = true)
    // "héllo wörld" = 11 chars but 13 UTF-8 bytes: char counting predicts
    // 1 + 11%3 = 3 faces, byte counting 1 + 13%3 = 2 — they MUST diverge
    val text = "héllo wörld"
    assert(text.length == 11 && text.getBytes("UTF-8").length == 13)
    val (ins, _) = ai.set("nfaces", Seq((Image(text.getBytes("UTF-8")), meta("who" -> "n"))))
    assert(ins == 2, "expansion count must follow byte length, not char length")
  }

  test("upsert: merge semantics + new input re-embeds and restashes original") {
    val ai = fresh()
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2", storeOriginal = true)
    ai.set("s", Seq((RawString("old"), meta("k" -> "v"))))
    ai.upsert("s", Equals("k", RawString("v")), Some(RawString("new")),
      Some(meta("extra" -> "yes")))
    val got = ai.getKey("s", Seq(RawString("new"))).collect()
    assert(got.length == 1)
    val m = got.head.getMap[String, org.apache.spark.sql.Row](1)
    assert(m("k").getString(1) == "v")      // merged: old key kept
    assert(m("extra").getString(1) == "yes")
    assert(ai.getKey("s", Seq(RawString("old"))).count() == 0)
  }

  test("convertStoreInputToEmbeddings: declared dim, unit norm, deterministic") {
    val ai = fresh()
    val out = ai.convertStoreInputToEmbeddings(
      Seq(RawString("a"), RawString("b")), "bge-large-en-v1.5")
    assert(out.forall(_._2.length == 1024))
    out.foreach { case (_, v) =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-4)
    }
    val again = ai.convertStoreInputToEmbeddings(Seq(RawString("a")), "bge-large-en-v1.5")
    assert(out.head._2.toSeq == again.head._2.toSeq)
  }

  test("unsupported model names are rejected at createStore (aiproxy_test.rs:2176)") {
    val e = new GraftEngine(spark)
    val ai = new graft.ai.AiEngine(e)
    val err = intercept[GraftException](
      ai.createStore("bad", "definitely-not-a-model", "all-minilm-l6-v2"))
    assert(err.getMessage.contains("unsupported ai model"))
    val err2 = intercept[GraftException](
      ai.createStore("bad", "all-minilm-l6-v2", "nope-v0"))
    assert(err2.getMessage.contains("unsupported ai model"))
    assert(e.listStores().isEmpty, "a failed createStore must not leave a store")
  }

  test("ai upsert variants: value-only and input-only (aiproxy_test.rs:2750,2890)") {
    val e = new GraftEngine(spark)
    val ai = new graft.ai.AiEngine(e)
    ai.createStore("uv", "all-minilm-l6-v2", "all-minilm-l6-v2", storeOriginal = true)
    ai.set("uv", Seq((RawString("doc one"): MetadataValue) ->
      meta("tag" -> "a", "keep" -> "x")))
    // value-only (input None): metadata MERGED (the AI layer always merges,
    // like the reference's update-in-place), embedding untouched — the same
    // raw input still finds it
    ai.upsert("uv", Equals("tag", RawString("a")),
      newInput = None, newValue = Some(meta("tag" -> "b")))
    val after = ai.getKey("uv", Seq(RawString("doc one"))).collect()
    assert(after.length == 1)
    val m = after.head.getMap[String, org.apache.spark.sql.Row](
      after.head.fieldIndex("value"))
    assert(m("tag").getString(1) == "b")
    assert(m("keep").getString(1) == "x", "merge must keep untouched keys")
    // input-only (value None): re-embedded under the new input, metadata
    // kept; the OLD input no longer resolves, the new one does
    ai.upsert("uv", Equals("tag", RawString("b")),
      newInput = Some(RawString("doc two")), newValue = None)
    assert(ai.getKey("uv", Seq(RawString("doc one"))).collect().isEmpty)
    val moved = ai.getKey("uv", Seq(RawString("doc two"))).collect()
    assert(moved.length == 1)
    assert(moved.head.getMap[String, org.apache.spark.sql.Row](
      moved.head.fieldIndex("value"))("tag").getString(1) == "b")
  }

  test("ai dropStore / purgeStores remove the backing engine store (cascade)") {
    val e = new GraftEngine(spark)
    val ai = new graft.ai.AiEngine(e)
    ai.createStore("casc", "all-minilm-l6-v2", "all-minilm-l6-v2")
    ai.set("casc", Seq((RawString("x"): MetadataValue) -> meta("k" -> "v")))
    assert(e.listStores().map(_.name) == Seq("casc"))
    e.dropStore("casc")
    assert(e.listStores().isEmpty)
    intercept[GraftException](ai.getSimN("casc", RawString("x"), 1,
      graft.types.Algorithm.CosineSimilarity))
    ai.createStore("casc2", "all-minilm-l6-v2", "all-minilm-l6-v2")
    assert(e.purgeStores() == 1)
    assert(e.listStores().isEmpty)
  }

  test("concurrent re-ingests serialize: stale ids resolve under the store lock") {
    // the stale-id frame is constructed by the engine under the store lock;
    // two writers re-ingesting overlapping inputs must land on exactly one
    // row per input with an exact len, regardless of interleaving
    val ai = fresh()
    ai.createStore("conc", "all-minilm-l6-v2", "all-minilm-l6-v2",
      storeOriginal = true)
    ai.set("conc", (0 until 8).map(i =>
      (RawString(s"doc$i"): MetadataValue) -> meta("v" -> "seed")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (0 until 4).map { w =>
      Future {
        ai.set("conc", (0 until 8).map(i =>
          (RawString(s"doc$i"): MetadataValue) -> meta("v" -> s"w$w")))
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    assert(ai.db.storeLen("conc") == 8)
    assert(ai.db.storeDf("conc").count() == 8)
    // serialized mutations: the last writer's batch rewrote every input, so
    // all rows carry exactly ONE writer's tag (a mixed set would mean two
    // writers' swaps interleaved mid-batch)
    val vs = ai.getKey("conc", (0 until 8).map(i => RawString(s"doc$i")))
      .collect().map(_.getMap[String, org.apache.spark.sql.Row](1)("v").getString(1))
      .toSet
    assert(vs.size == 1 && vs.subsetOf(Set("w0", "w1", "w2", "w3")),
      s"unexpected values $vs")
  }

  test("ai schema suite: isolation, cascade drop, public guard (aiproxy_test.rs schema tests)") {
    val ai = fresh()
    // same store name in two schemas: isolated stores, isolated contents
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2",
      storeOriginal = true, schema = "t1")
    ai.createStore("s", "all-minilm-l6-v2", "all-minilm-l6-v2",
      storeOriginal = true, schema = "t2")
    ai.set("s", Seq((RawString("one"): MetadataValue) -> meta("k" -> "a")),
      schema = "t1")
    ai.set("s", Seq(
      (RawString("one"): MetadataValue) -> meta("k" -> "b"),
      (RawString("two"): MetadataValue) -> meta("k" -> "c")), schema = "t2")
    assert(ai.db.storeLen("s", "t1") == 1)
    assert(ai.db.storeLen("s", "t2") == 2)
    assert(ai.getKey("s", Seq(RawString("one")), schema = "t1").collect()
      .head.getMap[String, org.apache.spark.sql.Row](1)("k").getString(1) == "a")
    // commands address the schema they name, not public
    intercept[GraftException](ai.getKey("s", Seq(RawString("one"))))
    // dropSchema cascades through the proxy; public refuses
    assert(ai.dropSchema("t1") == 1)
    intercept[GraftException](ai.getKey("s", Seq(RawString("one")), schema = "t1"))
    assert(ai.db.storeLen("s", "t2") == 2)
    intercept[GraftException](ai.dropSchema("public"))
  }

  test("ai DSL pipeline end-to-end (parse → embed → search)") {
    val ai = fresh()
    val script =
      """CREATESTORE aistore QUERYMODEL all-minilm-l6-v2 INDEXMODEL all-minilm-l6-v2 PREDICATES (tag) STOREORIGINAL;
        |SET (([hello world], {tag: greeting}), ([farewell], {tag: bye})) IN aistore PREPROCESSACTION nopreprocessing;
        |GETSIMN 1 WITH [hello world] USING cosinesimilarity IN aistore WHERE (tag = greeting);
        |GETKEY ([farewell]) IN aistore;
        |UPSERT ([changed greeting], {mood: happy}) WHERE (tag = greeting) IN aistore PREPROCESSACTION nopreprocessing;
        |GETKEY ([changed greeting]) IN aistore;
        |DELKEY ([farewell]) IN aistore""".stripMargin
    val results = graft.dsl.Pipeline.runAi(ai, script)
    assert(results.size == 7)
    results(4) match { // AI upsert: merge + re-embed through the pipeline;
      // the reference answers with its Set-shaped UpsertResult (updated=1)
      case Right(graft.dsl.Response.SetResult(0L, 1L)) => ()
      case other => fail(s"unexpected $other")
    }
    results(5) match {
      case Right(graft.dsl.Response.Entries(df)) =>
        val m = df.collect().head.getMap[String, org.apache.spark.sql.Row](1)
        assert(m("tag").getString(1) == "greeting") // merged old metadata
        assert(m("mood").getString(1) == "happy")
      case other => fail(s"unexpected $other")
    }
    assert(results(0) == Right(graft.dsl.Response.Ok))
    assert(results(1) == Right(graft.dsl.Response.SetResult(2, 0)))
    results(2) match {
      case Right(graft.dsl.Response.SimEntries(df)) =>
        val r = df.collect()
        assert(r.length == 1 && r.head.getStruct(0).getString(1) == "hello world")
      case other => fail(s"unexpected $other")
    }
    results(3) match {
      case Right(graft.dsl.Response.Entries(df)) => assert(df.count() == 1)
      case other => fail(s"unexpected $other")
    }
    assert(results(6) == Right(graft.dsl.Response.Count(1)))
  }
}
