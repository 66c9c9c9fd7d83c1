package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Gopher repetition suite: a plain-Scala reference (idiomatic
  * collections over Java's own Pattern.split — an independent
  * formulation of the documented conventions) differentially pins the
  * native kernel, first on a hand-written case table, then on the
  * markup-free fuzz corpus. */
class RepetitionSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  // ---- reference implementation (independent of the kernel) ----
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private def dupFracs(units: Seq[String]): (Double, Double) = {
    val counts = units.groupBy(identity).view.mapValues(_.size)
    val tot = units.map(u => u.codePointCount(0, u.length).toLong).sum
    val dup = counts.map { case (u, c) =>
      (c - 1).toLong * u.codePointCount(0, u.length) }.sum
    (if (units.isEmpty) 0.0
     else (units.size - counts.size).toDouble / units.size,
     if (tot == 0L) 0.0 else dup.toDouble / tot)
  }

  private def ref(text: String): Seq[Double] = {
    val (dlf, dlcf) = dupFracs(text.split("\n", -1).toSeq)
    val (dpf, dpcf) = dupFracs(text.split("\n\n", -1).toSeq)
    // trim 0x20 only, like Spark's trim
    val trimmed = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val toks = Ws.split(trimmed, -1).toSeq
    val lens = toks.map(t => t.codePointCount(0, t.length).toLong)
    val tot = lens.sum
    def ngrams(n: Int): Seq[(String, Long)] =
      toks.sliding(n).filter(_.size == n).map(g =>
        (g.mkString(" "), g.map(t => t.codePointCount(0, t.length).toLong).sum)
      ).toSeq
    val top = Seq(2, 3, 4).map { n =>
      if (tot == 0L || toks.size < n) 0.0
      else {
        val cells = ngrams(n).groupBy(_._1).toSeq
          .map { case (_, occ) => (occ.size.toLong, occ.head._2) }
        val (c, l) = cells.sortBy { case (c, l) => (-c, -l) }.head
        (c * l).toDouble / tot
      }
    }
    val dup = Seq(5, 6, 7, 8, 9, 10).map { n =>
      if (tot == 0L || toks.size < n) 0.0
      else {
        val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size)
        val covered = Array.fill(toks.size)(false)
        grams.zipWithIndex.foreach { case (g, s) =>
          if (counts(g) > 1) (s until s + n).foreach(covered(_) = true)
        }
        val num = lens.zipWithIndex.collect {
          case (l, i) if covered(i) => l }.sum
        num.toDouble / tot
      }
    }
    Seq(dlf, dlcf, dpf, dpcf) ++ top ++ dup
  }

  private def kernelOf(texts: Seq[String]): Seq[Seq[Double]] =
    texts.toDF("t")
      .select(TextOps.repetitionSignals(col("t")).as("s"))
      .collect().map(r => (0 until 13).map(i => r.getStruct(0).getDouble(i)))
      .toSeq

  test("repetitionSignals: documented cases") {
    val doc = "a b\na b\nc d"                  // 3 lines, one dup pair
    val spam = "spam spam spam spam spam spam" // total 2-gram repetition
    val cases = Seq(doc, spam, "", "   ", "one two three four five",
      "p q\n\np q\n\nr", "\tlead tab", "x\n\n\nx")
    val got = kernelOf(cases)
    cases.zip(got).foreach { case (t, k) =>
      assert(k == ref(t), s"diverged on [$t]: $k vs ${ref(t)}")
    }
    // spot-meaning checks on the first two (hand-computed, not ref())
    val d = got(0)
    assert(d(0) == 1.0 / 3.0)   // one of three lines is a repeat
    assert(d(1) == 3.0 / 9.0)   // one extra "a b" (3 chars) / 9 line chars
    val s2 = got(1)
    // top 2-gram "spam spam" ×5 ⋅ 8 chars / 24 token chars — the published
    // overlapping-count definition deliberately exceeds 1 on total spam
    assert(s2(4) == 40.0 / 24.0)
    assert(s2(7) == 1.0)        // every token covered by a dup 5-gram
  }

  test("query shape evaluates the kernel ONCE per row despite 13-field expansion") {
    // the query selects struct.as("r") then r.* — if CollapseProject
    // re-inlined the kernel per extracted field it would run 13× per row
    val df = spark.range(4).toDF("id")
      .select(col("id"), TextOps.repetitionSignals(
        concat(lit("w "), col("id"))).as("r"))
      .select(col("id"), col("r.*"))
    val plan = df.queryExecution.executedPlan.toString
    val evals = "rep_signals\\(".r.findAllIn(plan).length
    assert(evals == 1, s"kernel appears $evals times in:\n$plan")
  }

  test("repetitionSignals kernel == reference on the fuzz corpus") {
    val rnd = new scala.util.Random(0x6E9L)
    val atoms = Array("a", "b", "ab", "spam", "the", "wörd", "😀", "𝐀x",
      "_", "x2", "", "line one", "line one\nline one")
    val seps = Array(" ", "  ", "\t", "\n", "\n\n", "", "\f", "\r", "")
    val docs = (0 until 400).map { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(60)).foreach { _ =>
        sb.append(atoms(rnd.nextInt(atoms.length)))
        sb.append(seps(rnd.nextInt(seps.length)))
      }
      sb.toString
    }
    val got = kernelOf(docs)
    docs.zip(got).foreach { case (t, k) =>
      assert(k == ref(t), s"diverged on [${t.take(80)}…]")
    }
  }
}
