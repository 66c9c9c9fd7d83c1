package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

class LineDedupSpec extends AnyFunSuite {
  import spark.implicits._

  // line doc-frequencies: footer 4, nav 4, promo 3, everything else 1
  private val footer = "copyright example corp"
  private val corpus = Seq(
    (1L, s"alpha unique one\nshared nav bar\npromo banner\n$footer"),
    (2L, s"shared nav bar\nbeta unique two\npromo banner\n$footer"),
    (3L, s"gamma unique three\n$footer\npromo banner\nshared nav bar"),
    (4L, s"$footer\nshared nav bar"), // pure boilerplate
    (5L, s"delta unique five\nepsilon unique five b")
  ).toDF("doc_id", "text")

  private def cleaned(maxDf: Int): Map[Long, String] =
    Dedup.removeBoilerplateLines(corpus, "doc_id", "text", maxDf)
      .as[(Long, String)].collect().toMap

  test("lines above the doc-frequency cap are dropped, order preserved") {
    val got = cleaned(maxDf = 2) // footer, nav, promo all exceed df 2
    assert(got(1L) == "alpha unique one")
    assert(got(2L) == "beta unique two")
    assert(got(3L) == "gamma unique three")
    assert(got(5L) == "delta unique five\nepsilon unique five b")
  }

  test("documents made entirely of boilerplate disappear") {
    assert(!cleaned(maxDf = 2).contains(4L))
  }

  test("the cap is exclusive: df == maxDf survives") {
    val got = cleaned(maxDf = 3) // promo df=3 survives; nav/footer df=4 drop
    assert(got(1L) == "alpha unique one\npromo banner")
    assert(got(2L) == "beta unique two\npromo banner")
    assert(!got.contains(4L)) // doc4 is footer+nav only — still all-boilerplate
  }

  test("a permissive cap is the identity") {
    val got = cleaned(maxDf = 100)
    corpus.as[(Long, String)].collect().foreach { case (id, text) =>
      assert(got(id) == text)
    }
  }

  test("multi-line order is reassembled by original position, not content") {
    val df = Seq((9L, "z last first\na middle\nm end")).toDF("doc_id", "text")
    val got = Dedup.removeBoilerplateLines(df, "doc_id", "text", maxDf = 5)
      .as[(Long, String)].collect().toMap
    assert(got(9L) == "z last first\na middle\nm end")
  }
}
