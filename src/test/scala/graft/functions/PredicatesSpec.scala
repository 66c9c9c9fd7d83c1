package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark
import graft.types.{MetadataValue, PredicateCondition, StoreSchema}
import graft.types.MetadataValue.RawString
import graft.types.PredicateCondition._

/**
 * Property: the Catalyst compilation (`toColumn`) and the JVM evaluator
 * (`eval`) agree on every condition tree × metadata map — including the
 * reference's missing-key semantics (NotEquals/NotIn MATCH entries lacking
 * the key; Equals/In don't — store.rs:913-932, 961-986).
 */
class PredicatesSpec extends AnyFunSuite {

  private val keys = Seq("lang", "source", "tag")
  private val values = Seq("a", "b", "c", "d")

  private val genLeaf: Gen[PredicateCondition] = for {
    k <- Gen.oneOf(keys)
    kind <- Gen.choose(0, 3)
    v <- Gen.oneOf(values)
    vs <- Gen.nonEmptyContainerOf[Set, String](Gen.oneOf(values))
  } yield kind match {
    case 0 => Equals(k, RawString(v))
    case 1 => NotEquals(k, RawString(v))
    case 2 => In(k, vs.map(RawString(_): MetadataValue))
    case _ => NotIn(k, vs.map(RawString(_): MetadataValue))
  }

  private def genTree(depth: Int): Gen[PredicateCondition] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      2 -> genLeaf,
      1 -> (for { l <- genTree(depth - 1); r <- genTree(depth - 1) } yield And(l, r)),
      1 -> (for { l <- genTree(depth - 1); r <- genTree(depth - 1) } yield Or(l, r)))

  // 60 metadata maps with deliberate key-absence (missing-key semantics)
  private val maps: Seq[Map[String, MetadataValue]] = (0 until 60).map { i =>
    keys.zipWithIndex.flatMap { case (k, j) =>
      if ((i >> j) % 3 == 0) None // key absent for a third of combinations
      else Some(k -> (RawString(values((i * (j + 2)) % values.size)): MetadataValue))
    }.toMap
  }

  private lazy val df = {
    val rows = maps.zipWithIndex.map { case (m, i) =>
      Row(i.toLong, Seq(i.toFloat),
        m.map { case (k, RawString(s)) => k -> Row("raw_string", s, null)
                case _ => throw new IllegalStateException })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StoreSchema.entrySchema)
      .cache()
  }

  test("toColumn agrees with eval on random condition trees") {
    // drive the generator with fixed seeds (no scalatestplus bridge offline)
    val conds = (0 until 40).flatMap(i =>
      genTree(3).apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(conds.size >= 35) // generator should essentially never fail
    conds.foreach { cond =>
      val sparkIds = df.where(Predicates.toColumn(cond, col("value")))
        .select("id").collect().map(_.getLong(0)).toSet
      val jvmIds = maps.zipWithIndex
        .filter { case (m, _) => Predicates.eval(cond, m) }
        .map(_._2.toLong).toSet
      assert(sparkIds == jvmIds, s"mismatch for $cond")
    }
  }

  test("missing-key semantics pinned: NotEquals/NotIn match, Equals/In don't") {
    val m = Map.empty[String, MetadataValue]
    assert(Predicates.eval(NotEquals("k", RawString("v")), m))
    assert(Predicates.eval(NotIn("k", Set(RawString("v"))), m))
    assert(!Predicates.eval(Equals("k", RawString("v")), m))
    assert(!Predicates.eval(In("k", Set(RawString("v"))), m))
  }

  test("binary metadata (image/audio) compares by content") {
    val img = MetadataValue.Image(Array[Byte](1, 2, 3))
    val img2 = MetadataValue.Image(Array[Byte](1, 2, 3))
    val aud = MetadataValue.Audio(Array[Byte](1, 2, 3))
    assert(img == img2)
    assert(img != aud) // kind participates in equality
    assert(Predicates.eval(Equals("pic", img), Map("pic" -> img2)))
    assert(!Predicates.eval(Equals("pic", img), Map("pic" -> aud)))
  }
}
