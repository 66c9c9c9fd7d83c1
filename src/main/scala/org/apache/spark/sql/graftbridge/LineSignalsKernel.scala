// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The Gopher/C4 line-shape counters (Rae et al. 2021 §A1.1 bullet/ellipsis
 * drop rules; Raffel et al. 2020 §2.2 terminal-punctuation keep rule) as
 * ONE byte scan per document. The Column formulation this backs
 * ([[graft.text.TextOps.lineSignalsRegex]]) is a line-array split plus
 * three higher-order `filter(..., rlike)` passes — every lambda
 * interpreted, three regex machines per line; measured 7.0 s at 500k sf1
 * docs for what is arithmetically one pass over the bytes.
 *
 * Bit-compat contract (pinned to the retained formulation in
 * TextOpsSpec's differential):
 *  - lines are `split(text, "\n")` with Spark's default limit -1 —
 *    trailing empty strings KEPT, so n_lines = count(0x0A) + 1;
 *  - bullet is `trim(line).rlike("^[-*•]")`: Spark `trim` strips the
 *    space byte 0x20 ONLY (UTF8String.trim), and `^` anchors at input
 *    start (no MULTILINE) — so the test is "first non-space byte is
 *    '-' / '*' / the 3-byte • (E2 80 A2)";
 *  - ellipsis/terminal test `rtrim(line)` (trailing 0x20 stripped)
 *    against `(\.\.\.|…)$` / `[.!?"]$`. Java's `$` without UNIX_LINES
 *    also matches just BEFORE one final line terminator (\\r, U+0085,
 *    U+2028, U+2029 — a \n can never survive the line split), so both
 *    candidate end positions are checked: the exact end, and the end
 *    minus one trailing terminator. "abc.\r" matches, "abc.\r\r" does
 *    not (the $ sits before the LAST terminator only) — byte-for-byte
 *    the regex behavior, including on CRLF corpora where every line
 *    carries a trailing \r.
 *
 * Slot layout of the returned array<long>:
 * [n_lines, n_bullet, n_ellipsis_end, n_terminal].
 */
object LineSignalsImpl {

  /** End position of the line after stripping ONE trailing Java-regex
    * line terminator (the position `$` would match at), or `end` when no
    * terminator trails. Line bytes live in [start, end). */
  private def dollarEnd(t: UTF8String, start: Int, end: Int): Int = {
    if (end - start >= 1 && t.getByte(end - 1) == 0x0D) end - 1 // \r
    else if (end - start >= 2 && t.getByte(end - 2) == 0xC2.toByte &&
      t.getByte(end - 1) == 0x85.toByte) end - 2 // U+0085 NEL
    else if (end - start >= 3 && t.getByte(end - 3) == 0xE2.toByte &&
      t.getByte(end - 2) == 0x80.toByte &&
      (t.getByte(end - 1) == 0xA8.toByte || t.getByte(end - 1) == 0xA9.toByte))
      end - 3 // U+2028 LS / U+2029 PS
    else end
  }

  private def endsEllipsis(t: UTF8String, start: Int, end: Int): Boolean =
    (end - start >= 3 && t.getByte(end - 1) == '.' &&
      t.getByte(end - 2) == '.' && t.getByte(end - 3) == '.') ||
    (end - start >= 3 && t.getByte(end - 3) == 0xE2.toByte &&
      t.getByte(end - 2) == 0x80.toByte && t.getByte(end - 1) == 0xA6.toByte)

  private def endsTerminal(t: UTF8String, start: Int, end: Int): Boolean = {
    if (end <= start) false
    else {
      val b = t.getByte(end - 1)
      b == '.' || b == '!' || b == '?' || b == '"'
    }
  }

  def eval(t: UTF8String): ArrayData = {
    val nb = t.numBytes()
    var nLines = 0L
    var bullet = 0L
    var ellipsis = 0L
    var terminal = 0L
    var lineStart = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || t.getByte(i) == 0x0A) {
        nLines += 1
        // leading-trim for the bullet anchor: 0x20 only (Spark trim)
        var s = lineStart
        while (s < i && t.getByte(s) == 0x20) s += 1
        if (s < i) {
          val b0 = t.getByte(s)
          if (b0 == '-' || b0 == '*' ||
            (b0 == 0xE2.toByte && s + 2 < i &&
              t.getByte(s + 1) == 0x80.toByte &&
              t.getByte(s + 2) == 0xA2.toByte)) bullet += 1
        }
        // rtrim for the end-anchored tests: trailing 0x20 only
        var e = i
        while (e > lineStart && t.getByte(e - 1) == 0x20) e -= 1
        val e2 = dollarEnd(t, lineStart, e)
        if (endsEllipsis(t, lineStart, e) ||
          (e2 != e && endsEllipsis(t, lineStart, e2))) ellipsis += 1
        if (endsTerminal(t, lineStart, e) ||
          (e2 != e && endsTerminal(t, lineStart, e2))) terminal += 1
        lineStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array(nLines, bullet, ellipsis, terminal))
  }
}

case class LineSignals(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "line_signals"

  override def nullSafeEval(v: Any): Any =
    LineSignalsImpl.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.LineSignalsImpl.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
