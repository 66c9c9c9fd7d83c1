// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The Gopher repetition-signal suite (Rae et al. 2021, appendix A1.1 —
 * the repetitious-text half of the quality rules; the non-repetition
 * half is [[GopherFlags]]) as ONE native pass per document. 13 signals:
 *
 *   0  dup_line_frac        (lines occurring more than once, by count)
 *   1  dup_line_char_frac   (characters in occurrences beyond the first)
 *   2  dup_para_frac        (same, paragraphs = split on blank line)
 *   3  dup_para_char_frac
 *   4-6  top{2,3,4}gram_char_frac  (chars of the most frequent n-gram ×
 *        its count / total token chars; ties by count break to the
 *        LONGER n-gram — a deterministic refinement of the published
 *        "most common n-gram", whose tie-break is arbitrary)
 *   7-12 dup{5..10}gram_char_frac (chars of token positions covered by
 *        at least one occurrence of a DUPLICATED n-gram / total token
 *        chars — the overlap-marking coverage of the published filters)
 *
 * Every signal is a per-document pure function — a narrow map with no
 * explode/shuffle, which is the only shape that survives 100 TB (the
 * exploded alternative is (6+3)·tokens rows per doc into 9 groupBys).
 * State is bounded by the document itself: count maps hold at most
 * `tokens` entries and are freed per row.
 *
 * Bit-compat conventions (mirrored by the DuckDB oracle and the spec's
 * plain-Scala reference): tokens = `\s+`-split of `trim` (Spark split
 * keeps trailing empty tokens — limit -1), lines = split on `\n`,
 * paragraphs = split on `\n\n` (both keep empties), character counts
 * are CODEPOINTS of tokens only (separators excluded; n-gram identity
 * is the space-join, collision-free since tokens contain no
 * whitespace), fractions are integer-over-integer double divisions with
 * 0/0 → 0.0.
 */
object RepSignalsImpl {

  private val TopNs = Array(2, 3, 4)
  private val DupNs = Array(5, 6, 7, 8, 9, 10)

  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Java `Pattern.compile("\\s+").split(s, -1)` without the regex
    * machinery: runs of ASCII `\s` split; leading run yields one empty
    * token (trim only strips 0x20, so a leading tab still produces it);
    * trailing empties are KEPT (limit -1 — Spark `split`'s semantics,
    * unlike Java's default). */
  private def wsTokens(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    val n = s.length
    var i = 0
    var start = 0
    while (i < n) {
      if (isJavaWs(s.charAt(i))) {
        out += s.substring(start, i)
        i += 1
        while (i < n && isJavaWs(s.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    out += s.substring(start, n)
    out.toArray
  }

  /** Literal split keeping empties (Spark `split(c, sep, -1)` for a
    * regex-free separator). */
  private def literalSplit(s: String, sep: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var from = 0
    var i = s.indexOf(sep)
    while (i >= 0) {
      out += s.substring(from, i)
      from = i + sep.length
      i = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.toArray
  }

  @inline private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** (dup_frac, dup_char_frac) over a unit list (lines or paragraphs):
    * dup_frac = (count - distinct) / count; char numerator counts every
    * occurrence beyond the first at the unit's codepoint length. */
  private def dupUnitFracs(units: Array[String]): (Double, Double) = {
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < units.length) {
      counts.merge(units(i), 1, Integer.sum _)
      i += 1
    }
    var dupChars = 0L
    var totChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val len = cpLen(e.getKey).toLong
      totChars += e.getValue * len
      dupChars += (e.getValue - 1) * len
    }
    val dupFrac =
      if (units.length == 0) 0.0
      else (units.length - counts.size).toDouble / units.length
    val charFrac = if (totChars == 0L) 0.0 else dupChars.toDouble / totChars
    (dupFrac, charFrac)
  }

  def eval(v: UTF8String): ArrayData = {
    val raw = v.toString
    val out = new Array[Any](13)

    val (dlf, dlcf) = dupUnitFracs(literalSplit(raw, "\n"))
    val (dpf, dpcf) = dupUnitFracs(literalSplit(raw, "\n\n"))
    out(0) = dlf; out(1) = dlcf; out(2) = dpf; out(3) = dpcf

    // trim = Spark trim: 0x20 only
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    val toks = wsTokens(raw.substring(b, e))
    val T = toks.length
    val lens = new Array[Int](T)
    var totChars = 0L
    var i = 0
    while (i < T) { lens(i) = cpLen(toks(i)); totChars += lens(i); i += 1 }

    // one count map per n; n-gram identity is the space-join (tokens
    // contain no whitespace, so the join is collision-free); each map
    // cell carries (count, char length) so the top scan is one pass
    var slot = 4
    var ni = 0
    while (ni < TopNs.length) {
      val n = TopNs(ni)
      out(slot) =
        if (totChars == 0L || T < n) 0.0
        else {
          val counts = new java.util.HashMap[String, Array[Long]]()
          var s = 0
          while (s + n <= T) {
            val sb = new java.lang.StringBuilder()
            var cl = 0L
            var j = s
            while (j < s + n) {
              if (j > s) sb.append(' ')
              sb.append(toks(j)); cl += lens(j); j += 1
            }
            val cell = counts.computeIfAbsent(sb.toString, _ => Array(0L, cl))
            cell(0) += 1
            s += 1
          }
          // top by count, ties to the larger char length (deterministic)
          var bestCnt = 0L
          var bestCl = 0L
          val it = counts.values().iterator()
          while (it.hasNext) {
            val c = it.next()
            if (c(0) > bestCnt || (c(0) == bestCnt && c(1) > bestCl)) {
              bestCnt = c(0); bestCl = c(1)
            }
          }
          (bestCnt * bestCl).toDouble / totChars
        }
      slot += 1; ni += 1
    }

    ni = 0
    while (ni < DupNs.length) {
      val n = DupNs(ni)
      out(slot) =
        if (totChars == 0L || T < n) 0.0
        else {
          val counts = new java.util.HashMap[String, Int]()
          val keys = new Array[String](T - n + 1)
          var s = 0
          while (s + n <= T) {
            val sb = new java.lang.StringBuilder()
            var j = s
            while (j < s + n) {
              if (j > s) sb.append(' ')
              sb.append(toks(j)); j += 1
            }
            keys(s) = sb.toString
            counts.merge(keys(s), 1, Integer.sum _)
            s += 1
          }
          val covered = new Array[Boolean](T)
          s = 0
          while (s + n <= T) {
            if (counts.get(keys(s)) > 1) {
              var j = s
              while (j < s + n) { covered(j) = true; j += 1 }
            }
            s += 1
          }
          var dupChars = 0L
          var p = 0
          while (p < T) { if (covered(p)) dupChars += lens(p); p += 1 }
          dupChars.toDouble / totChars
        }
      slot += 1; ni += 1
    }

    new GenericArrayData(out)
  }
}

/** Column expression over [[RepSignalsImpl]]; NULL in, NULL out. */
case class RepSignals(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rep_signals"

  override def nullSafeEval(v: Any): Any =
    RepSignalsImpl.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.RepSignalsImpl.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
