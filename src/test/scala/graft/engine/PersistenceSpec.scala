package graft.engine

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark
import graft.types._
import graft.types.MetadataValue.RawString
import graft.types.PredicateCondition._

/** Tables-as-truth persistence: restart preserves stores, data, indexes
  * (reference analog: db/src/tests/server_tests.rs persistence suites at
  * :772 and :3219; atomicity discipline utils/src/persistence.rs). */
class PersistenceSpec extends AnyFunSuite {

  private def meta(kvs: (String, String)*): Map[String, MetadataValue] =
    kvs.map { case (k, v) => k -> (RawString(v): MetadataValue) }.toMap

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-persist").toString

  test("engine restart preserves stores, entries, metadata, and index configs") {
    val root = tmpRoot()
    val e1 = new GraftEngine(spark, Some(root))
    e1.createStore("s", 3, predicates = Set("tag"))
    e1.setSeq("s", Seq(
      (Array(1f, 2f, 3f), meta("tag" -> "a")),
      (Array(4f, 5f, 6f), meta("tag" -> "b"))))
    e1.createNonLinearIndex("s", Seq(NonLinearConfig.KDTreeConfig()))
    e1.createStore("other", 2, schema = "t2") // stays empty — must survive too

    // "restart": brand-new engine from the same root
    val e2 = GraftEngine.load(spark, root)
    assert(e2.listStores().map(_.name) == Seq("s"))
    assert(e2.listStores("t2").map(_.name) == Seq("other"))
    val info = e2.getStore("s")
    assert(info.len == 2 && info.dimension == 3)
    assert(info.predicateIndexes == Seq("tag"))
    assert(info.nonLinearIndexes == Seq("kdtree"))
    // data readable, predicates work
    assert(e2.getPred("s", Equals("tag", RawString("a"))).count() == 1)
    // rebuilt ANN index serves
    val top = e2.getSimN("s", Array(1f, 2f, 3f), 1, Algorithm.KDTree).collect()
    assert(top.head.getAs[Float]("similarity") == 0.0f)
    e2.purgeStores()
  }

  test("mutations after reload persist; version dirs are GCed to the live one") {
    val root = tmpRoot()
    val e1 = new GraftEngine(spark, Some(root))
    e1.createStore("s", 1)
    e1.setSeq("s", Seq((Array(1f), meta("k" -> "1"))))
    e1.setSeq("s", Seq((Array(2f), meta("k" -> "2"))))
    e1.delKey("s", Seq(Array(1f)))

    val e2 = GraftEngine.load(spark, root)
    assert(e2.storeDf("s").count() == 1)
    e2.setSeq("s", Seq((Array(3f), meta("k" -> "3"))))
    val e3 = GraftEngine.load(spark, root)
    assert(e3.storeDf("s").count() == 2)
    // only one live version dir remains after GC
    val versions = Files.list(Paths.get(root, "data", "public", "s"))
      .iterator()
    val dirs = scala.jdk.CollectionConverters.IteratorHasAsScala(versions)
      .asScala.map(_.getFileName.toString).filter(_.startsWith("v")).toSeq
    assert(dirs.size == 1, s"expected single live version, got $dirs")
    e3.purgeStores()
  }

  test("dropStore removes data dirs; dropped store absent after reload") {
    val root = tmpRoot()
    val e1 = new GraftEngine(spark, Some(root))
    e1.createStore("gone", 1)
    e1.setSeq("gone", Seq((Array(1f), meta("x" -> "y"))))
    e1.dropStore("gone")
    assert(!Files.exists(Paths.get(root, "data", "public", "gone")))
    val e2 = GraftEngine.load(spark, root)
    assert(e2.listStores().isEmpty)
  }

  test("in-memory engines (no persistRoot) keep working with zero disk IO") {
    val e = new GraftEngine(spark)
    e.createStore("mem", 2)
    e.setSeq("mem", Seq((Array(1f, 1f), meta("a" -> "b"))))
    assert(e.storeDf("mem").count() == 1)
    e.dropStore("mem")
  }
}
