package graft.engine

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark
import graft.types._
import graft.types.MetadataValue.RawString
import graft.types.PredicateCondition._

/** Engine-level semantics (reference scenarios from
  * db/src/tests/server_tests.rs + upsert.rs, transliterated). */
class EngineSpec extends AnyFunSuite {

  private def meta(kvs: (String, String)*): Map[String, MetadataValue] =
    kvs.map { case (k, v) => k -> (RawString(v): MetadataValue) }.toMap

  private def fresh() = new GraftEngine(spark)

  test("set: dedup-by-content, insert/update counts (store.rs:1104-1121)") {
    val e = fresh()
    e.createStore("s", 3)
    val (i1, u1) = e.setSeq("s", Seq(
      (Array(1f, 2f, 3f), meta("name" -> "a")),
      (Array(1f, 2f, 3f), meta("name" -> "b")), // same vector → one entry, later wins
      (Array(4f, 5f, 6f), meta("name" -> "c"))))
    assert((i1, u1) == (2L, 0L))
    val (i2, u2) = e.setSeq("s", Seq((Array(1f, 2f, 3f), meta("name" -> "z"))))
    assert((i2, u2) == (0L, 1L))
    assert(e.storeDf("s").count() == 2)
    val got = e.getKey("s", Seq(Array(1f, 2f, 3f))).collect()
    assert(got.length == 1)
    val m = got.head.getMap[String, org.apache.spark.sql.Row](1)
    assert(m("name").getString(1) == "z") // last set wins
  }

  test("set: dimension mismatch rejected") {
    val e = fresh()
    e.createStore("s", 3)
    val ex = intercept[GraftException] {
      e.setSeq("s", Seq((Array(1f, 2f), meta("a" -> "b"))))
    }
    assert(ex.msg.contains("dimension"))
  }

  test("createStore: error_if_exists semantics + drop guards") {
    val e = fresh()
    assert(e.createStore("s", 2))
    intercept[GraftException](e.createStore("s", 2))
    assert(!e.createStore("s", 2, errorIfExists = false))
    intercept[GraftException](e.dropSchema("public"))
    intercept[GraftException](e.dropStore("nope"))
    assert(e.dropStore("nope", errorIfNotExists = false) == 0)
    assert(e.dropStore("s") == 1)
    intercept[GraftException](e.storeDf("s"))
  }

  test("upsert: exactly-one invariant + merge semantics (store.rs:441-528)") {
    val e = fresh()
    e.createStore("s", 2)
    e.setSeq("s", Seq(
      (Array(1f, 1f), meta("k" -> "a", "x" -> "1")),
      (Array(2f, 2f), meta("k" -> "b"))))
    // no match → error
    intercept[GraftException](
      e.upsert("s", Equals("k", RawString("zzz")), newValue = Some(meta("y" -> "2"))))
    // merge keeps old keys
    e.upsert("s", Equals("k", RawString("a")),
      newValue = Some(meta("y" -> "2")), mergeMetadata = true)
    val row = e.getPred("s", Equals("k", RawString("a"))).collect().head
    val m = row.getMap[String, org.apache.spark.sql.Row](1)
    assert(m.contains("x") && m.contains("y"))
    // replace drops old keys
    e.upsert("s", Equals("k", RawString("b")), newValue = Some(meta("only" -> "v")))
    assert(e.getPred("s", Equals("k", RawString("b"))).count() == 0) // k replaced away
    assert(e.getPred("s", Equals("only", RawString("v"))).count() == 1)
  }

  test("upsert key-only: metadata preserved, old key gone (upsert.rs:16-97)") {
    val e = fresh()
    e.createStore("s", 3, predicates = Set("id"))
    e.setSeq("s", Seq((Array(1f, 2f, 3f), meta("id" -> "123"))))
    val cond = Equals("id", RawString("123"))
    // the reference's UpsertResult: updated=1, inserted=0 on every success
    assert(e.upsert("s", cond, newKey = Some(Array(4f, 5f, 6f))) == ((0L, 1L)))
    assert(e.getPred("s", cond).count() == 1)
    assert(e.getKey("s", Seq(Array(1f, 2f, 3f))).count() == 0)
    val rows = e.getKey("s", Seq(Array(4f, 5f, 6f))).collect()
    assert(rows.length == 1)
    assert(rows.head.getMap[String, org.apache.spark.sql.Row](1)("id")
      .getString(1) == "123")
  }

  test("upsert both key and value: full replacement at the new key (upsert.rs:308-399)") {
    val e = fresh()
    e.createStore("s", 3, predicates = Set("id"))
    e.setSeq("s", Seq((Array(1f, 2f, 3f), meta("id" -> "123"))))
    assert(e.upsert("s", Equals("id", RawString("123")),
      newKey = Some(Array(4f, 5f, 6f)),
      newValue = Some(meta("id" -> "456"))) == ((0L, 1L)))
    assert(e.getKey("s", Seq(Array(1f, 2f, 3f))).count() == 0)
    val rows = e.getKey("s", Seq(Array(4f, 5f, 6f))).collect()
    assert(rows.length == 1)
    assert(rows.head.getMap[String, org.apache.spark.sql.Row](1)("id")
      .getString(1) == "456")
    assert(e.storeLen("s") == 1)
  }

  test("upsert matching more than one entry is rejected (upsert.rs:493-562)") {
    val e = fresh()
    e.createStore("s", 2, predicates = Set("k"))
    e.setSeq("s", Seq(
      (Array(1f, 1f), meta("k" -> "dup")),
      (Array(2f, 2f), meta("k" -> "dup"))))
    val err = intercept[GraftException](
      e.upsert("s", Equals("k", RawString("dup")), newValue = Some(meta("v" -> "x"))))
    assert(err.getMessage.contains("more than one"))
    // store untouched by the failed upsert
    assert(e.storeLen("s") == 2)
    assert(e.getPred("s", Equals("v", RawString("x"))).count() == 0)
  }

  test("mutation keeps ANN indexes live and serving (non_linear.rs:244-251)") {
    val e = fresh()
    e.createStore("s", 4)
    e.setSeq("s", (0 until 50).map(i =>
      (Array(i.toFloat, i.toFloat, 0f, 0f), meta("i" -> i.toString))))
    e.createNonLinearIndex("s", Seq(NonLinearConfig.KDTreeConfig()))
    // mutate AFTER index creation — index must still serve, reflecting the write
    e.setSeq("s", Seq((Array(100f, 100f, 0f, 0f), meta("i" -> "new"))))
    val res = e.getSimN("s", Array(100f, 100f, 0f, 0f), 1, Algorithm.KDTree).collect()
    assert(res.length == 1)
    assert(res.head.getAs[Float]("similarity") == 0.0f) // exact hit on the new vector
    // delete then search again: deleted vector must be gone from the index
    assert(e.delKey("s", Seq(Array(100f, 100f, 0f, 0f))) == 1)
    val res2 = e.getSimN("s", Array(100f, 100f, 0f, 0f), 1, Algorithm.KDTree).collect()
    assert(res2.head.getAs[Float]("similarity") != 0.0f)
    // catalog never advertises an index that can't serve
    assert(e.getStore("s").nonLinearIndexes == Seq("kdtree"))
  }

  test("ANN delta-patch equals full rebuild across a mutation sequence") {
    val e = fresh()
    e.createStore("s", 4, nonLinearIndexes = Seq(
      NonLinearConfig.KDTreeConfig(), NonLinearConfig.HNSWConfig()))
    e.setSeq("s", (0 until 120).map(i =>
      (Array(i.toFloat, (i % 7).toFloat, (i % 3).toFloat, 1f), meta("i" -> i.toString))))
    // mutations ride the patch path (indexes exist + touched ids known):
    // set, delKey, delPred, and upsert are all bucket-incremental
    e.setSeq("s", Seq((Array(500f, 1f, 1f, 1f), meta("i" -> "new"))))
    e.delKey("s", Seq(Array(3f, 3f, 0f, 1f)))
    e.delPred("s", Equals("i", RawString("77")))
    e.upsert("s", Equals("i", RawString("50")),
      newKey = Some(Array(600f, 1f, 1f, 1f)), mergeMetadata = true)
    // oracle: a parallel store built fresh from scratch (full rebuild)
    val o = fresh()
    o.createStore("o", 4, nonLinearIndexes = Seq(
      NonLinearConfig.KDTreeConfig(), NonLinearConfig.HNSWConfig()))
    o.setSeq("o", ((0 until 120).filterNot(Set(3, 77, 50)).map(i =>
      (Array(i.toFloat, (i % 7).toFloat, (i % 3).toFloat, 1f), meta("i" -> i.toString))) ++
      Seq((Array(500f, 1f, 1f, 1f), meta("i" -> "new")),
        (Array(600f, 1f, 1f, 1f), meta("i" -> "50")))))
    for (algo <- Seq(Algorithm.KDTree, Algorithm.HNSW)) {
      val q = Array(42f, 0f, 0f, 1f)
      val patched = e.getSimN("s", q, 8, algo).collect()
        .map(r => (r.getSeq[Float](0), r.getAs[Float]("similarity"))).toSeq
      val rebuilt = o.getSimN("o", q, 8, algo).collect()
        .map(r => (r.getSeq[Float](0), r.getAs[Float]("similarity"))).toSeq
      assert(patched == rebuilt, s"$algo patch != rebuild")
    }
    assert(e.storeDf("s").count() == 119) // 120 + 1 − delKey − delPred (upsert moves)
  }

  test("delPred + getPred missing-key semantics end-to-end") {
    val e = fresh()
    e.createStore("s", 1)
    e.setSeq("s", Seq(
      (Array(1f), meta("lang" -> "en")),
      (Array(2f), meta("lang" -> "de")),
      (Array(3f), meta()))) // no lang key
    // NotEquals matches the missing-key entry (scan semantics)
    assert(e.getPred("s", NotEquals("lang", RawString("en"))).count() == 2)
    assert(e.delPred("s", Equals("lang", RawString("de"))) == 1)
    assert(e.storeDf("s").count() == 2)
    assert(e.delPred("s", Equals("lang", RawString("zzz"))) == 0)
  }

  test("predicate index ops: idempotent create, drop validation") {
    val e = fresh()
    e.createStore("s", 1, predicates = Set("a"))
    assert(e.createPredIndex("s", Set("a", "b")) == 1) // only b is new
    assert(e.getStore("s").predicateIndexes == Seq("a", "b"))
    assert(e.dropPredIndex("s", Set("b")) == 1)
    intercept[GraftException](e.dropPredIndex("s", Set("zzz")))
    assert(e.dropPredIndex("s", Set("zzz"), errorIfNotExists = false) == 0)
  }

  test("upsert with neither new key nor new value is rejected (aiproxy_test.rs:3130)") {
    val e = fresh()
    e.createStore("ups_none", 1)
    e.setSeq("ups_none", Seq(Array(1f) -> Map("k" -> (RawString("v"): MetadataValue))))
    val err = intercept[GraftException](
      e.upsert("ups_none", Equals("k", RawString("v"))))
    assert(err.getMessage.contains("requires a new key or a new value"))
  }

  test("GetStore/ListStores return non-linear index configs (server_tests.rs:4072)") {
    val e = fresh()
    e.createStore("cfgstore", 8, nonLinearIndexes = Seq(
      NonLinearConfig.KDTreeConfig(),
      NonLinearConfig.HNSWConfig(efConstruction = 50, maximumConnections = 25,
        maximumConnectionsZero = 50, efSearch = 20)))
    val info = e.getStore("cfgstore")
    assert(info.nonLinearIndexes == Seq("hnsw", "kdtree"))
    assert(info.nonLinearConfigs.contains("kdtree"))
    assert(info.nonLinearConfigs.exists(_.startsWith(
      "hnsw(efC=50,m=25,m0=50,ef=20,metric=")))
    assert(e.listStores().find(_.name == "cfgstore").get.nonLinearConfigs ==
      info.nonLinearConfigs)
  }

  test("set with an empty batch is a no-op: (0,0), no version bump") {
    val e = fresh()
    e.createStore("empty_set", 2)
    e.setSeq("empty_set", Seq(Array(1f, 2f) -> Map.empty[String, MetadataValue]))
    assert(e.setSeq("empty_set", Seq.empty) == ((0L, 0L)))
    assert(e.storeLen("empty_set") == 1)
    // the store still answers (no dangling swap state)
    assert(e.storeDf("empty_set").count() == 1)
  }

  test("duplicate non-linear index prevention: only new kinds count (server_tests.rs:3670)") {
    val e = fresh()
    e.createStore("dup", 3,
      nonLinearIndexes = Seq(NonLinearConfig.HNSWConfig()))
    // same HNSW again → 0 created (exists, not duplicated)
    assert(e.createNonLinearIndex("dup", Seq(NonLinearConfig.HNSWConfig())) == 0)
    // KDTree is new → 1
    assert(e.createNonLinearIndex("dup", Seq(NonLinearConfig.KDTreeConfig())) == 1)
    // both exist → 0
    assert(e.createNonLinearIndex("dup", Seq(
      NonLinearConfig.HNSWConfig(), NonLinearConfig.KDTreeConfig())) == 0)
    assert(e.getStore("dup").nonLinearIndexes.sorted == Seq("hnsw", "kdtree"))
  }

  test("getStore on a missing store is a not-found error (server_tests.rs:4250)") {
    val e = fresh()
    val err = intercept[GraftException](e.getStore("no_such_store"))
    assert(err.getMessage.toLowerCase.contains("not found"))
  }

  test("dropSchema / purgeStores / listStores") {
    val e = fresh()
    e.createStore("a", 1)
    e.createStore("b", 1, schema = "other")
    e.createStore("c", 1, schema = "other")
    assert(e.listStores().map(_.name) == Seq("a"))
    assert(e.listStores("other").map(_.name) == Seq("b", "c"))
    assert(e.dropSchema("other") == 2)
    intercept[GraftException](e.dropSchema("other")) // now gone
    assert(e.purgeStores() == 1)
    assert(e.listStores().isEmpty)
  }

  test("concurrent writers to one store serialize: no lost updates, len exact") {
    // 8 threads x disjoint batches; unlocked read-modify-write would lose
    // whole batches (both writers claim version N+1). Checked on BOTH
    // engine kinds — the persistent path must also never collide version
    // dirs on disk.
    val root = java.nio.file.Files.createTempDirectory("graft-conc").toString
    Seq(new GraftEngine(spark), new GraftEngine(spark, Some(root))).foreach { e =>
      e.createStore("conc", 1)
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          e.setSeq("conc", (0 until 5).map(i =>
            (Array((t * 100 + i).toFloat), meta("t" -> t.toString))))
          e.delKey("conc", Seq(Array((t * 100).toFloat)))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      // every thread inserted 5 distinct vectors then deleted 1
      assert(e.storeLen("conc") == 32, s"lost update (persist=${e.persistRoot.isDefined})")
      assert(e.storeDf("conc").count() == 32)
      e.purgeStores()
    }
    graft.engine.Persistence.deleteDir(root)
  }
}
