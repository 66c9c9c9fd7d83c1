package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  private def extract(cases: (String, String)*): Unit = {
    val out = cases.map(_._1).toDF("h")
      .select(Html.extractText(col("h")).as("t")).collect().map(_.getString(0))
    cases.map(_._2).zip(out).zip(cases.map(_._1)).foreach { case ((want, got), in) =>
      assert(got == want, s"extractText($in): got [$got], want [$want]")
    }
  }

  test("extractText: documented rules, case by case") {
    extract(
      // tags strip and act as word boundaries
      "<p>a</p><p>b</p>" -> "a b",
      "<div class=\"x\" data-y='1'>hi</div>" -> "hi",
      // comments drop, including multi-line and markup inside
      "a<!-- <p>junk</p>\nmore -->b" -> "a b",
      // dropped elements lose their CONTENT, case-insensitive, with attrs
      "x<script>var a=1;</script>y" -> "x y",
      "x<SCRIPT src=\"a.js\">if(a<b){}</SCRIPT>y" -> "x y",
      "x<style>p{color:red}</style>y" -> "x y",
      "x<noscript>enable js</noscript>y<template>t</template>z" -> "x y z",
      // UNCLOSED block: open tag strips, payload survives as text
      "x<script>var a=1;" -> "x var a=1;",
      // entity decode, single-pass: &amp;lt; is literal &lt; not <
      "T&amp;Cs &lt;b&gt; &quot;q&quot; &#39;a&apos; &amp;lt;raw&gt;" ->
        "T&Cs <b> \"q\" 'a' &lt;raw>",
      // &nbsp; is whitespace and collapses with neighbors
      "a&nbsp;&nbsp;b   c\n\td" -> "a b c d",
      // ends trim
      "  <br/> padded <hr>  " -> "padded")
    // null in, null out
    val n = Seq[Option[String]](None).toDF("h")
      .select(Html.extractText(col("h"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("extractText stays whole-stage-codegen (no UDF, no kernel)") {
    // non-foldable input so the projection survives to the physical plan
    val df = spark.range(4).select(Html.extractText(
      concat(lit("<p>"), col("id"), lit("</p>"))))
    // "*(1)" is executedPlan.toString's whole-stage-codegen marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
