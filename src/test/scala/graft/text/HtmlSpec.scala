package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  // every case runs through BOTH formulations — the kernel (product
  // path) and the builtin regex chain (the semantic reference) — and
  // each must produce the expected text
  private def extract(cases: (String, String)*): Unit = {
    val df = cases.map(_._1).toDF("h")
    for ((fn, label) <- Seq(
        (Html.extractText _, "kernel"),
        (Html.extractTextBuiltins _, "builtins"))) {
      val out = df.select(fn(col("h")).as("t")).collect().map(_.getString(0))
      cases.map(_._2).zip(out).zip(cases.map(_._1)).foreach {
        case ((want, got), in) =>
          assert(got == want, s"$label($in): got [$got], want [$want]")
      }
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

  test("kernel == builtin chain on adversarial markup (differential)") {
    // deliberately pathological: nested openers, closers inside comments,
    // entity fragments split by tags, unicode \b flanks, case soup,
    // unclosed everything
    val adversarial = Seq(
      "<script><!--</script>--></script>x",
      "<style><script></style></script>tail",
      "<scr<!-- -->ipt>alert(1)</script>done",
      "<SCRIPTé>unicode-flank</SCRIPT>k",  // é after name: \b fails
      "<scripts>not a block</scripts>",
      "<script data-x=\"a>b\">early-gt</script>rest",
      "&l<x>t; &amp;lt; &amp;amp; &&lt;&",
      "<script>a<style>b</style>c</script>d<style>e</style>f",
      "< p>space-tag</ p>",
      "<p", "p>", "<>", "&", "&lt", "&#39", "",
      "a<!--unterminated", "x<script>unterminated",
      "</script>orphan-closer<script>then-open</script \t\n>z",
      "  a  \t b c\r\n",
      "<TEMPLATE x>T</template  >u<NOSCRIPT>n</noscript>v")
    val df = adversarial.toDF("h")
    val rows = df.select(
      Html.extractText(col("h")).as("k"),
      Html.extractTextBuiltins(col("h")).as("b")).collect()
    rows.zip(adversarial).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"kernel/builtins diverge on [$in]: [${r.getString(0)}] vs [${r.getString(1)}]")
    }
  }

  test("extractText stays whole-stage-codegen (no UDF)") {
    // non-foldable input so the projection survives to the physical plan
    val df = spark.range(4).select(Html.extractText(
      concat(lit("<p>"), col("id"), lit("</p>"))))
    // "*(1)" is executedPlan.toString's whole-stage-codegen marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
