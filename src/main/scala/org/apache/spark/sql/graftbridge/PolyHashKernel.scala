// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared implementation of the document-fingerprint rolling hash so the
 * interpreted and codegen'd paths are literally the same loop (a standalone
 * object gets a Java static forwarder, callable from generated code).
 *
 * Semantics pinned to the original higher-order formulation
 * `aggregate(transform(split(text, ''), c -> ascii(c)), 7, (a,c) -> (a*31+c) % 1e9+7)`
 * and its DuckDB oracle mirror:
 *  - iterate CODEPOINTS (split('') keeps surrogate pairs together; ascii
 *    returns the full codepoint — an emoji is one step of value ≥ 0x10000);
 *  - the EMPTY string folds one zero character (Java `"".split("")` yields
 *    `[""]` and `ascii('') = 0`), so fp("") = (7·31 + 0) % p = 217, not 7.
 */
object PolyHashImpl {
  final val Mod = 1000000007L
  final val Mult = 31L
  final val Init = 7L

  def compute(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return (Init * Mult) % Mod
    var acc = Init
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * Mult + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/**
 * The rolling-hash document fingerprint as a native expression — one pass
 * over the string per row, inside whole-stage codegen. The higher-order
 * formulation it replaces splits the text into one single-char STRING per
 * codepoint and folds an interpreted lambda over the array: O(len) object
 * allocation per row, measured as the entire cost of the text_fingerprint
 * bench entry. Kept bit-identical to that formulation (TextOpsSpec pins
 * parity on ASCII/CJK/emoji/empty inputs).
 */
case class PolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHashImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.PolyHashImpl.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
