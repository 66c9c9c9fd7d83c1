// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The Gopher quality-rule bundle (Rae et al. 2021, MassiveText §A.1.1) as
 * one native pass over the token array. The Column formulation this backs
 * ([[graft.text.TextOps.gopherFlags]]) is four higher-order filters /
 * transforms plus eight array_contains probes per row — all of which
 * evaluate INTERPRETED (lambda expressions sit outside whole-stage
 * codegen), measured ~35 µs/row at sf1 = 17 s over 500k docs for what is
 * arithmetically one scan of the tokens. This kernel folds every rule in
 * a single loop: per-token char count (Σ numChars ≡ the non-whitespace
 * char count of the original text, since tokens are exactly the \\s+
 * split), '#'/'...' containment, has-an-ASCII-letter, and a distinct-
 * stopword bitmask via UTF8String.toLowerCase equality (the same
 * lowercasing `lower()` applies). Same double ratios, same inclusive
 * bounds — flag-for-flag equal to the HOF formulation, pinned in
 * TextOpsSpec's differential.
 *
 * Slot layout of the returned array<boolean>:
 * [ok_words, ok_mean_len, ok_symbol, ok_alpha, ok_stop, pass].
 */
object GopherFlagsImpl {
  private val Stops: Array[UTF8String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(UTF8String.fromString)
  private val AllStops = (1 << Stops.length) - 1
  private val Hash = UTF8String.fromString("#")
  private val Ellipsis = UTF8String.fromString("...")

  def eval(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    var chars = 0L
    var sym = 0
    var alpha = 0
    var stopMask = 0
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      chars += t.numChars()
      if (t.contains(Hash) || t.contains(Ellipsis)) sym += 1
      // rlike "[A-Za-z]": any ASCII letter byte — UTF-8 continuation and
      // lead bytes are all >= 0x80, so a byte scan can't false-positive
      var hasAlpha = false
      var b = 0
      val nb = t.numBytes()
      while (!hasAlpha && b < nb) {
        val c = t.getByte(b)
        hasAlpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        b += 1
      }
      if (hasAlpha) alpha += 1
      if (stopMask != AllStops) {
        val lw = t.toLowerCase
        var s = 0
        while (s < Stops.length) {
          if ((stopMask & (1 << s)) == 0 && lw.equals(Stops(s)))
            stopMask |= 1 << s
          s += 1
        }
      }
      i += 1
    }
    val nw = math.max(n, 1).toDouble
    val okWords = n >= 50 && n <= 100000
    val mean = chars / nw
    val okMean = mean >= 3.0 && mean <= 10.0
    val okSymbol = sym / nw <= 0.1
    val okAlpha = alpha / nw >= 0.8
    val okStop = Integer.bitCount(stopMask) >= 2
    new GenericArrayData(Array[Any](okWords, okMean, okSymbol, okAlpha,
      okStop, okWords && okMean && okSymbol && okAlpha && okStop))
  }
}

case class GopherFlags(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(BooleanType, containsNull = false)
  override def prettyName: String = "gopher_flags"

  override def nullSafeEval(v: Any): Any =
    GopherFlagsImpl.eval(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.GopherFlagsImpl.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
