// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The four per-document counts behind the quality-score heuristic, in ONE
 * native pass: whitespace token count, punctuation-class char count,
 * English-stopword match count, and total char count. The builtin
 * formulation ([[graft.text.TextOps.qualityScore]]'s pre-kernel shape)
 * paid two full `split` tokenizations (token arrays allocated just to be
 * size()d), one `regexp_extract_all` that materialized an array of every
 * punctuation match, and one ten-way-alternation `regexp_count` — per
 * row, all allocation- or regex-bound (measured 49.6 s at 500k docs).
 * Only the COUNTING fuses here; every double ratio/clamp stays in
 * ordinary expression land on these exact integers, so the arithmetic is
 * identical by construction.
 *
 * Count-for-count contracts (pinned against the regex formulation in
 * TextOpsSpec's differential):
 *  - tokens ≡ `size(split(trim(text), "\\s+"))`: strip 0x20 ends (Spark
 *    `trim` removes spaces only), then one token per separator GAP plus
 *    one — i.e. (maximal `\s`-run count) + 1. Spark's split runs
 *    Pattern.split with limit = -1, which KEEPS leading and trailing
 *    empty tokens (unlike Java's default split) — a detail the fuzz
 *    differential caught on trailing `\r`/`\t` (trailing spaces are
 *    gone by then, other `\s` survives the space-only trim).
 *  - punct ≡ `regexp_count(text, "[^A-Za-z0-9\\s]")`: every codepoint
 *    not ASCII-alphanumeric and not Java `\s` ([ \t\n\x0B\f\r]) — which
 *    includes every non-ASCII codepoint, counted once per LEAD byte.
 *  - stops ≡ `regexp_count(lower(text), "\\b(the|and|of|is|to|in|that|
 *    it|was|for)\\b")`: a match is a maximal ASCII `[a-z0-9_]` run of
 *    the LOWERCASED text equal to one of the ten alternatives, flanked
 *    by non-word codepoints in `\b`'s UNICODE sense ([[JavaWordBoundary]]
 *    — Java's `\b` is Unicode-aware even though its default `\w` is
 *    ASCII-only, so `öthe` contains NO match; a later fuzz round caught
 *    this as a latent divergence in the original ASCII-run scan) —
 *    matches can't overlap, so the scan over word runs reproduces the
 *    non-overlapping count.
 *  - chars ≡ `length(text)` (codepoints).
 *
 * Slot layout of the returned array<long>: [tokens, punct, stops, chars].
 */
object TextStatsImpl {
  private val Stops: Array[Array[Byte]] =
    Array("the", "and", "of", "is", "to", "in", "that", "it", "was", "for")
      .map(_.getBytes("UTF-8"))

  // Java \s (default flags): ASCII whitespace only
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  private def isAlnum(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
  // Java \w (default flags): ASCII word chars
  private def isWord(b: Byte): Boolean = isAlnum(b) || b == '_'

  def eval(t: UTF8String): ArrayData = {
    val bytes = t.getBytes
    val n = bytes.length
    // ---- tokens: Spark trim strips 0x20 only; split keeps leading AND
    // trailing empties (limit -1), so tokens = (\s-run count) + 1 — the
    // empty string falls out of the same formula (0 runs → [""])
    var lo = 0
    while (lo < n && bytes(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    var tokens = 1L
    var inWs = false
    var i0 = lo
    while (i0 < hi) {
      val ws = bytes(i0) >= 0 && isWs(bytes(i0))
      if (ws && !inWs) { tokens += 1; inWs = true }
      else if (!ws) inWs = false
      i0 += 1
    }
    // ---- punct + chars over the ORIGINAL text: one byte scan
    var punct = 0L
    var chars = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 0) { // ASCII
        chars += 1
        if (!isAlnum(b) && !isWs(b)) punct += 1
      } else if ((b & 0xC0) != 0x80) { // lead byte: one non-ASCII codepoint
        chars += 1
        punct += 1
      }
      i += 1
    }
    // ---- stopwords over the LOWERCASED text: maximal [a-z0-9_] runs
    val lw = t.toLowerCase.getBytes
    var stops = 0L
    var s = 0
    val ln = lw.length
    while (s < ln) {
      if (lw(s) >= 0 && isWord(lw(s))) {
        var e = s
        while (e < ln && lw(e) >= 0 && isWord(lw(e))) e += 1
        val len = e - s
        val bounded = (s == 0 || !JavaWordBoundary.isWordBefore(lw, s)) &&
          (e == ln || !JavaWordBoundary.isWordAt(lw, e))
        var k = 0
        var hit = false
        while (!hit && bounded && k < Stops.length) {
          val st = Stops(k)
          if (st.length == len) {
            var j = 0
            while (j < len && lw(s + j) == st(j)) j += 1
            hit = j == len
          }
          k += 1
        }
        if (hit) stops += 1
        s = e
      } else s += 1
    }
    new GenericArrayData(Array[Any](tokens, punct, stops, chars))
  }
}

case class TextStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_stats"

  override def nullSafeEval(v: Any): Any =
    TextStatsImpl.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.TextStatsImpl.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Count of BPE-ish pre-tokenizer matches — the native twin of
 * `regexp_count(text, " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+")`
 * (the GPT-2 pre-tokenizer shape, [[graft.text.TextOps.BpePattern]]).
 * The regex's non-overlapping left-to-right matches are exactly the
 * maximal same-class runs of the text, where class ∈ {ASCII letters,
 * ASCII digits, other-non-whitespace} — the optional leading space only
 * extends a match leftward, never changes the count, and whitespace
 * (Java ASCII `\s`) separates runs without matching. Every non-ASCII
 * codepoint falls in the `other` class (its lead AND continuation bytes
 * all map there, so a multi-byte char can't split a run). One byte scan
 * per row versus a three-way-alternation regex engine pass (measured
 * ~10 s at 500k docs); count-pinned against the regex in TextOpsSpec
 * and the fuzz corpus.
 */
case class BpeRunCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "bpe_run_count"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    var cnt = 0L
    var prev = 0 // 0 = ws/none, 1 = alpha, 2 = digit, 3 = other
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val cls =
        if (b >= 0) {
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) 1
          else if (b >= '0' && b <= '9') 2
          else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
            b == '\f' || b == '\r') 0
          else 3
        } else 3
      if (cls != 0 && cls != prev) cnt += 1
      prev = cls
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRunCount", this, classOf[BpeRunCount].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) ((${classOf[BpeRunCount].getName}) $ref).nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
