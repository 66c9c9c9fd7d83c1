// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTML → plain-text extraction as ONE native expression —
 * [[graft.text.Html.extractTextBuiltins]] is 14 sequential codegen'd
 * regex/replace passes per row (14 full scans + Pattern NFA overhead +
 * 13 intermediate string materializations), and HTML strip is the very
 * first pass of a web-corpus ingest, i.e. it runs over 100% of the raw
 * bytes. This kernel reproduces the chain BIT-IDENTICALLY (HtmlSpec pins
 * the differential; KernelFuzzSpec runs an adversarial corpus) in three
 * hand-rolled scans: comments, dropped-element blocks (skipped outright
 * when the element never occurs), and a single fused
 * tags+entities+collapse+trim emit pass.
 *
 * The fusion is sound because every upstream replacement inserts `' '`,
 * and no downstream pattern (tag, entity) can match across a space —
 * so pass ORDER is preserved exactly while tags/entities/collapse merge
 * into one scan (a decoded `&lt;` can never be re-parsed as a tag
 * because tag stripping precedes entity decoding in the reference
 * chain, and here the tag branch only fires on a literal `<` read from
 * the post-block input).
 *
 * Bit-compat notes (the Java-regex semantics being reproduced):
 *  - `\b` after the element name is UNICODE-aware (word = `_` or
 *    `Character.isLetterOrDigit(codepoint)` — decode the flanking
 *    codepoint, not the char);
 *  - `(?i)` without UNICODE_CASE folds ASCII ONLY (`İ` does NOT match
 *    `i` — `String.regionMatches(true)` would wrongly accept it, so the
 *    comparison here folds only `A-Z`);
 *  - regex `\s` without UNICODE_CHARACTER_CLASS is exactly
 *    `[ \t\n\x0B\f\r]` (U+00A0 etc. pass through untouched);
 *  - Spark `trim` strips 0x20 only — after collapse every boundary run
 *    is a single 0x20, so suppressing leading/trailing pending spaces
 *    is exact.
 */
object HtmlExtractImpl {

  private val Dropped: Array[String] = Array("script", "style", "noscript", "template")
  private val EntFrom: Array[String] =
    Array("&lt;", "&gt;", "&quot;", "&#39;", "&apos;", "&nbsp;", "&amp;")
  // &nbsp; maps into the whitespace channel (pendingSpace), not a literal
  private val EntTo: Array[Char] = Array('<', '>', '"', '\'', '\'', ' ', '&')

  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** ASCII-only case-insensitive region match (Java `(?i)` semantics;
    * `pat` must be lowercase ASCII). */
  private def asciiRegionIC(s: String, off: Int, pat: String): Boolean = {
    if (off < 0 || off + pat.length > s.length) return false
    var i = 0
    while (i < pat.length) {
      var a = s.charAt(off + i)
      if (a >= 'A' && a <= 'Z') a = (a + 32).toChar
      if (a != pat.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Java `\b` at `pos` coming out of a word char: true iff `pos` is the
    * end of input or the codepoint AT `pos` is not a word char. */
  private def boundaryAt(s: String, pos: Int): Boolean = {
    if (pos >= s.length) return true
    val cp = s.codePointAt(pos)
    !(cp == '_' || Character.isLetterOrDigit(cp))
  }

  /** `(?s)<!--.*?-->` → `' '`, replace-all. indexOf chain is exact: the
    * regex takes the earliest `<!--` and its nearest `-->`; if an opener
    * has no closer, no later opener can have one either (any later `-->`
    * would also close the earlier opener). */
  private def stripComments(s: String): String = {
    var i = s.indexOf("<!--")
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var from = 0
    while (i >= 0) {
      val close = s.indexOf("-->", i + 4)
      if (close < 0) i = -1 // unterminated: no match here or later
      else {
        sb.append(s, from, i).append(' ')
        from = close + 3
        i = s.indexOf("<!--", from)
      }
    }
    sb.append(s, from, s.length).toString
  }

  /** `(?is)<el\b[^>]*>.*?</el\s*>` → `' '`, replace-all, one element.
    * Opener = case-insensitive `<el` with a non-word codepoint (or EOF)
    * after the name; its tag ends at the FIRST following `>` (that is
    * all `[^>]*>` can match). Closer = the earliest case-insensitive
    * `</el` after the open tag followed by ASCII-`\s*` then `>`. If an
    * opener with a complete open tag finds no closer, no later opener
    * can either (a later closer would have closed this one), so the
    * scan ends — matching the regex engine's behavior exactly. */
  private def stripBlock(s: String, el: String): String = {
    val open = "<" + el
    if (s.length < open.length + 1) return s
    var i = findOpen(s, 0, open)
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var from = 0
    while (i >= 0) {
      val gt = s.indexOf('>', i + open.length)
      if (gt < 0) i = -1 // open tag never closes: no match here or later
      else {
        val end = findClose(s, gt + 1, "</" + el)
        if (end < 0) i = -1 // no closer exists: nothing later can match
        else {
          sb.append(s, from, i).append(' ')
          from = end
          i = findOpen(s, from, open)
        }
      }
    }
    if (from == 0) s else sb.append(s, from, s.length).toString
  }

  /** Earliest opener position ≥ from: case-insensitive `open` with a
    * `\b` after the element name. */
  private def findOpen(s: String, from: Int, open: String): Int = {
    var i = from
    val limit = s.length - open.length
    while (i <= limit) {
      if (s.charAt(i) == '<' && asciiRegionIC(s, i, open) &&
          boundaryAt(s, i + open.length)) return i
      i += 1
    }
    -1
  }

  /** End position (exclusive) of the earliest `close` + `\s*>` at ≥ from,
    * or -1. A `</el` hit whose tail fails `\s*>` is skipped and the scan
    * continues — `.*?` extends to the next candidate. */
  private def findClose(s: String, from: Int, close: String): Int = {
    var i = from
    val limit = s.length - close.length
    while (i <= limit) {
      if (s.charAt(i) == '<' && asciiRegionIC(s, i, close)) {
        var j = i + close.length
        while (j < s.length && isJavaWs(s.charAt(j))) j += 1
        if (j < s.length && s.charAt(j) == '>') return j + 1
      }
      i += 1
    }
    -1
  }

  /** Fused `(?s)<[^>]*>`→' ' + entity decode + `\s+`→' ' + trim, one
    * emit-side scan. `pending` is the collapsed-whitespace channel: tags,
    * ASCII whitespace and `&nbsp;` all raise it; emitting a literal
    * flushes it as one 0x20 (suppressed at the start, dropped at the
    * end — exactly collapse-then-trim). */
  private def tagsEntitiesCollapse(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pending = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt >= 0) { pending = true; i = gt + 1 }
        else { // `<` with no `>` anywhere after: literal, like the regex
          if (pending && sb.length > 0) sb.append(' ')
          pending = false; sb.append(c); i += 1
        }
      } else if (c == '&') {
        var k = 0
        var hit = -1
        while (hit < 0 && k < EntFrom.length) {
          if (s.startsWith(EntFrom(k), i)) hit = k
          k += 1
        }
        if (hit < 0) {
          if (pending && sb.length > 0) sb.append(' ')
          pending = false; sb.append(c); i += 1
        } else if (EntTo(hit) == ' ') { pending = true; i += EntFrom(hit).length }
        else {
          if (pending && sb.length > 0) sb.append(' ')
          pending = false; sb.append(EntTo(hit)); i += EntFrom(hit).length
        }
      } else if (isJavaWs(c)) { pending = true; i += 1 }
      else {
        if (pending && sb.length > 0) sb.append(' ')
        pending = false; sb.append(c); i += 1
      }
    }
    sb.toString
  }

  def eval(v: UTF8String): UTF8String = {
    var s = v.toString
    s = stripComments(s)
    var k = 0
    while (k < Dropped.length) { s = stripBlock(s, Dropped(k)); k += 1 }
    UTF8String.fromString(tagsEntitiesCollapse(s))
  }
}

/** Column expression over [[HtmlExtractImpl]]; NULL in, NULL out. */
case class HtmlExtract(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract"

  override def nullSafeEval(v: Any): Any =
    HtmlExtractImpl.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.HtmlExtractImpl.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
