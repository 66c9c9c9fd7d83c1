package graft.ai

import scala.io.Source

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark
import graft.engine.GraftEngine
import graft.types.{Algorithm, MetadataValue}
import graft.types.MetadataValue.RawString

/**
 * The sentence-embedding golden fixture (FIXTURES.md §1, standing in for
 * the reference's mock_data.json / word_to_vector flow,
 * db/src/tests/mod.rs): sentence → 384-dim vector, committed at
 * src/test/resources/sentences_384d.json. Pins BOTH the embedder (any
 * change to the mock's hash/normalization breaks the golden vectors) and
 * the end-to-end most-similar ordering through the AI engine.
 */
class SentenceFixtureSpec extends AnyFunSuite {

  private lazy val fixture: Map[String, Array[Float]] = {
    val src = Source.fromResource("sentences_384d.json")
    try JsonMethods.parse(src.mkString) match {
      case JObject(fields) => fields.map {
        case (s, JArray(vals)) => s -> vals.map {
          case JDouble(d) => d.toFloat
          case JInt(i) => i.toFloat
          case other => fail(s"bad element $other")
        }.toArray
        case other => fail(s"bad entry $other")
      }.toMap
      case other => fail(s"bad fixture $other")
    } finally src.close()
  }

  test("mock embedder reproduces the golden vectors exactly") {
    val emb = Embedders.forModel("all-minilm-l6-v2")
    assert(fixture.size == 10)
    fixture.foreach { case (sentence, expected) =>
      val got = emb.embedOne(RawString(sentence)).head
      assert(got.length == 384)
      got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(math.abs(g - e) < 1e-6f, s"'$sentence'[$i]: $g != $e")
      }
    }
  }

  test("top-3 most-similar ordering through the AI engine matches brute force") {
    val ai = new AiEngine(new GraftEngine(spark))
    ai.createStore("sentences", "all-minilm-l6-v2", "all-minilm-l6-v2",
      storeOriginal = true)
    ai.set("sentences", fixture.keys.toSeq.sorted.map(s =>
      (RawString(s): MetadataValue) -> Map("text" -> (RawString(s): MetadataValue))))
    val query = "the cat sat on the mat"
    val got = ai.getSimN("sentences", RawString(query), 3, Algorithm.CosineSimilarity)
      .collect().map(_.getStruct(0).getString(1)).toSeq
    // brute force over the fixture vectors
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val va = a.map(_.toDouble); val vb = b.map(_.toDouble)
      va.zip(vb).map { case (x, y) => x * y }.sum /
        (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
    }
    val expected = fixture.toSeq
      .map { case (s, v) => (s, cos(fixture(query), v)) }
      .sortBy { case (s, c) => (-c, s) }.take(3).map(_._1)
    assert(got.head == query) // self is most similar (sim 1.0)
    assert(got == expected, s"got $got expected $expected")
  }
}
