// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Language-ID marker counts in ONE native pass — the twin of the five
 * `regexp_count(lower(text), marker)` scans behind
 * [[graft.text.TextOps.langId]] (markers: `\b(w1|…|w10)\b` stopword
 * alternations for en/de/fr/es plus the Han range `[\x{4e00}-\x{9fff}]`
 * for zh). Five regex engine passes over every document measured ~5 s
 * at 500k docs; this is one lowercase + one byte scan.
 *
 * Count contracts (pinned against the regex formulation in TextOpsSpec
 * and the fuzz corpus):
 *  - word markers: with default Java regex flags, a `\b(w|…)\b` match
 *    on the LOWERCASED text is a maximal ASCII `[a-z0-9_]` run equal to
 *    one alternative AND flanked by non-word codepoints in `\b`'s
 *    UNICODE sense ([[JavaWordBoundary]] — `öthe` does NOT match `the`
 *    even though `\w` itself is ASCII-only; the fuzz differential
 *    caught exactly this). A run that appears in several languages'
 *    sets increments EVERY one of them, matching the independent
 *    per-language scans.
 *  - zh: one count per codepoint in U+4E00..U+9FFF of the lowercased
 *    text (lowercasing never maps into or out of the Han block; each
 *    such codepoint is a single 3-byte UTF-8 sequence).
 *
 * Output slots: [count(set 0), …, count(set n-1), hanCount].
 */
/**
 * Java's default-flags `\b` word test, applied to the UTF-8 CODEPOINT
 * flanking a span. A documented java.util.regex inconsistency the fuzz
 * differential caught live: without UNICODE_CHARACTER_CLASS, `\w`
 * matches ASCII `[A-Za-z0-9_]` only, but `\b`'s notion of "word char"
 * is `'_' || Character.isLetterOrDigit(cp)` — UNICODE-aware. So
 * `\bthe\b` does NOT match inside `öthe` (ö is a letter → no boundary),
 * while a pure byte-class scan would think it does. Every kernel that
 * reproduces a `\b` therefore decodes the flanking codepoint and asks
 * Java's question, not the ASCII one. (RE2's `\b` is ASCII-only — a
 * cross-engine caveat for non-ASCII-adjacent matches; the oracle corpus
 * is ASCII-flanked, and the kernels pin to the Spark/Java side.)
 */
object JavaWordBoundary {
  @inline private def isWordAscii(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_'

  private def cpAt(s: Array[Byte], pos: Int): Int = {
    val b = s(pos)
    if (b >= 0) b
    else if ((b & 0xE0) == 0xC0 && pos + 1 < s.length)
      ((b & 0x1F) << 6) | (s(pos + 1) & 0x3F)
    else if ((b & 0xF0) == 0xE0 && pos + 2 < s.length)
      ((b & 0x0F) << 12) | ((s(pos + 1) & 0x3F) << 6) | (s(pos + 2) & 0x3F)
    else if ((b & 0xF8) == 0xF0 && pos + 3 < s.length)
      ((b & 0x07) << 18) | ((s(pos + 1) & 0x3F) << 12) |
        ((s(pos + 2) & 0x3F) << 6) | (s(pos + 3) & 0x3F)
    else 0xFFFD
  }

  /** Is the codepoint STARTING at byte `pos` a \b-word char? */
  def isWordAt(s: Array[Byte], pos: Int): Boolean = {
    val b = s(pos)
    if (b >= 0) isWordAscii(b)
    else { val cp = cpAt(s, pos); cp == '_' || Character.isLetterOrDigit(cp) }
  }

  /** Is the codepoint ENDING just before byte `pos` a \b-word char? */
  def isWordBefore(s: Array[Byte], pos: Int): Boolean = {
    var p = pos - 1
    if (s(p) >= 0) isWordAscii(s(p))
    else {
      while (p > 0 && (s(p) & 0xC0) == 0x80) p -= 1
      val cp = cpAt(s, p)
      cp == '_' || Character.isLetterOrDigit(cp)
    }
  }
}

object LangMarkerImpl {
  def eval(t: UTF8String, sets: Array[Array[Array[Byte]]]): ArrayData = {
    val lw = t.toLowerCase.getBytes
    val n = lw.length
    val counts = new Array[Long](sets.length + 1)
    var i = 0
    while (i < n) {
      val b = lw(i)
      if (b >= 0) {
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_') {
          var e = i
          while (e < n && lw(e) >= 0 &&
            ((lw(e) >= 'a' && lw(e) <= 'z') || (lw(e) >= '0' && lw(e) <= '9') ||
              lw(e) == '_')) e += 1
          val len = e - i
          val bounded = (i == 0 || !JavaWordBoundary.isWordBefore(lw, i)) &&
            (e == n || !JavaWordBoundary.isWordAt(lw, e))
          var s = if (bounded) 0 else sets.length
          while (s < sets.length) {
            val words = sets(s)
            var k = 0
            var hit = false
            while (!hit && k < words.length) {
              val w = words(k)
              if (w.length == len) {
                var j = 0
                while (j < len && lw(i + j) == w(j)) j += 1
                hit = j == len
              }
              k += 1
            }
            if (hit) counts(s) += 1
            s += 1
          }
          i = e
        } else i += 1
      } else if ((b & 0xF0) == 0xE0 && i + 2 < n) {
        // 3-byte sequence: the only width the Han block lives at
        val cp = ((b & 0x0F) << 12) | ((lw(i + 1) & 0x3F) << 6) | (lw(i + 2) & 0x3F)
        if (cp >= 0x4E00 && cp <= 0x9FFF) counts(sets.length) += 1
        i += 3
      } else if ((b & 0xE0) == 0xC0) i += 2
      else if ((b & 0xF8) == 0xF0) i += 4
      else i += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }
}

case class LangMarkerCounts(child: Expression, wordSets: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val setsBytes: Array[Array[Array[Byte]]] =
    wordSets.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lang_marker_counts"

  override def nullSafeEval(v: Any): Any =
    LangMarkerImpl.eval(v.asInstanceOf[UTF8String], setsBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langMarkerCounts", this,
      classOf[LangMarkerCounts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  ((${classOf[LangMarkerCounts].getName}) $ref).nullSafeEval($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Hand-rolled leftmost/non-overlapping matchers for the three PII
 * patterns ([[graft.text.Pii]]: email, IPv4, phone — all inside the
 * java.util.regex ∩ RE2 common subset, no lookaround/backreferences),
 * reproducing the regex engine's match spans byte-for-byte so the
 * kernels below can replace six engine passes per document with plain
 * byte scans. Every span rule is derived from the greedy-with-
 * backtracking semantics of the specific pattern and pinned against the
 * `regexp_replace`/`regexp_count` formulations in TextOpsSpec plus a
 * PII-adversarial fuzz corpus (multiple `@`s, dot runs, over-long
 * octets, digit-run flanks, non-ASCII adjacency):
 *
 *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: a match
 *    exists at the earliest `@` (≥ scan position) with ≥1 local-class
 *    char before it; the local `+` is greedy so the start is the
 *    maximal local-class run start (clipped to the scan position — the
 *    engine never matches into a previous match). The domain `+` is
 *    greedy over `[A-Za-z0-9.-]`; since `.` is IN the class the char
 *    after the maximal run can never be `.`, so the engine always
 *    backtracks: the largest split point q with `run[q] == '.'`
 *    followed by ≥2 ASCII letters wins, and the match ends after that
 *    maximal letter run.
 *  - IPv4 `\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b`: `\d{1,3}` can
 *    never give back chars usefully (the next literal is `.` and any
 *    shorter prefix is followed by a digit), so each group must be a
 *    COMPLETE maximal digit run of length 1..3; the leading/trailing
 *    `\b` means the CODEPOINTS flanking the span must be non-word in
 *    `\b`'s Unicode sense ([[JavaWordBoundary]]).
 *  - phone `\b\d{3}[- .]\d{3}[- .]\d{4}\b`: fixed counts — maximal
 *    runs of exactly 3/3/4 digits with one `[- .]` byte between, same
 *    boundary rule.
 *
 * Candidate starts are digit runs whose preceding byte is non-word
 * (mid-run attempts always fail `\b`), tried left to right; a success
 * resumes scanning at the match end — exactly the engine's order.
 */
object PiiImpl {
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isLocal(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      b == '.' || b == '-'
  @inline private def isSep(b: Byte): Boolean = b == '-' || b == ' ' || b == '.'

  /** Non-overlapping leftmost email spans as (start, end) pairs packed
    * into a flat array. */
  def emailSpans(s: Array[Byte]): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val n = s.length
    var i = 0
    var a = 0
    while (a < n) {
      if (s(a) == '@' && a > i) {
        // local part: maximal local-class run ending at a-1, clipped to i
        var lo = a - 1
        if (lo >= i && s(lo) >= 0 && isLocal(s(lo))) {
          while (lo > i && s(lo - 1) >= 0 && isLocal(s(lo - 1))) lo -= 1
          // domain run after '@'
          var m = a + 1
          while (m < n && s(m) >= 0 && isDomain(s(m))) m += 1
          // backtrack: largest q in [a+2, m-1) with s(q)=='.' and >=2 letters after
          var q = m - 1
          var end = -1
          while (end < 0 && q >= a + 2) {
            if (s(q) == '.') {
              var e = q + 1
              while (e < n && s(e) >= 0 && isLetter(s(e))) e += 1
              if (e - (q + 1) >= 2) end = e
            }
            q -= 1
          }
          if (end > 0) {
            out += lo; out += end
            i = end
            a = end - 1 // loop increment lands on `end`
          }
        }
      }
      a += 1
    }
    out.toArray
  }

  /** Shared digit-run pattern walker for IPv4/phone. `lens` are the
    * required group lengths (0 = 1..3 digits, else exact); `sepIsDot`
    * selects `\.` vs `[- .]` between groups. */
  private def numSpans(s: Array[Byte], lens: Array[Int], sepIsDot: Boolean): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val n = s.length
    var i = 0
    while (i < n) {
      if (isDigit(s(i)) && (i == 0 || !JavaWordBoundary.isWordBefore(s, i))) {
        // candidate start: walk the groups
        var p = i
        var g = 0
        var ok = true
        while (ok && g < lens.length) {
          var r = p
          while (r < n && isDigit(s(r))) r += 1
          val len = r - p
          val want = lens(g)
          if (want == 0) ok = len >= 1 && len <= 3
          else ok = len == want
          if (ok) {
            p = r
            if (g < lens.length - 1) {
              val sepOk = p < n && (if (sepIsDot) s(p) == '.' else s(p) >= 0 && isSep(s(p)))
              if (sepOk) p += 1 else ok = false
            }
          }
          g += 1
        }
        if (ok && (p == n || !JavaWordBoundary.isWordAt(s, p))) {
          out += i; out += p
          i = p
        } else i += 1
      } else i += 1
    }
    out.toArray
  }

  def ipSpans(s: Array[Byte]): Array[Int] = numSpans(s, Array(0, 0, 0, 0), sepIsDot = true)
  def phoneSpans(s: Array[Byte]): Array[Int] = numSpans(s, Array(3, 3, 4), sepIsDot = false)

  def replace(s: Array[Byte], spans: Array[Int], token: Array[Byte]): Array[Byte] = {
    if (spans.isEmpty) return s
    var kept = s.length
    var k = 0
    while (k < spans.length) { kept -= spans(k + 1) - spans(k); k += 2 }
    val out = new Array[Byte](kept + token.length * (spans.length / 2))
    var src = 0
    var dst = 0
    k = 0
    while (k < spans.length) {
      val st = spans(k); val en = spans(k + 1)
      System.arraycopy(s, src, out, dst, st - src); dst += st - src
      System.arraycopy(token, 0, out, dst, token.length); dst += token.length
      src = en
      k += 2
    }
    System.arraycopy(s, src, out, dst, s.length - src)
    out
  }

  private val EmailTok = "<EMAIL>".getBytes("UTF-8")
  private val IpTok = "<IP>".getBytes("UTF-8")
  private val PhoneTok = "<PHONE>".getBytes("UTF-8")

  /** The ordered redaction chain (email → IPv4 → phone), each pass over
    * the previous pass's output — identical to the three chained
    * `regexp_replace`s in [[graft.text.Pii.redactAll]]. */
  def redact(t: UTF8String): UTF8String = {
    val b0 = t.getBytes
    val s1 = replace(b0, emailSpans(b0), EmailTok)
    val s2 = replace(s1, ipSpans(s1), IpTok)
    UTF8String.fromBytes(replace(s2, phoneSpans(s2), PhoneTok))
  }

  /** Per-kind match counts over the ORIGINAL text — the audit contract
    * of [[graft.text.Pii.piiCounts]] (independent scans; overlapping
    * spans count for every kind they match). */
  def counts(t: UTF8String): ArrayData = {
    val b = t.getBytes
    new GenericArrayData(Array[Any](
      emailSpans(b).length / 2L, ipSpans(b).length / 2L, phoneSpans(b).length / 2L))
  }
}

case class PiiRedact(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "pii_redact"
  override def nullSafeEval(v: Any): Any = PiiImpl.redact(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.PiiImpl.redact($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PiiMatchCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pii_match_counts"
  override def nullSafeEval(v: Any): Any = PiiImpl.counts(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.PiiImpl.counts($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
