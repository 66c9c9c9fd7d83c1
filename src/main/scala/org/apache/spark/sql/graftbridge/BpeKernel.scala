// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Broadcastable BPE merge table: the learned (left, right) pairs in rank
 * order, plus transient lookup/caching state rebuilt after deserialization.
 *
 * Scale shape: this object IS the "bounded merge table broadcast" — at most
 * `numMerges` entries (a vocabulary budget, thousands to tens of thousands)
 * shipped once per executor inside the serialized plan. Encoding is then a
 * pure per-row projection: no shuffle, no join, the corpus never moves.
 *
 * The word cache exploits the Zipf shape of natural text: distinct
 * pre-tokens are a tiny fraction of token occurrences, so almost every
 * word is a hash hit rather than a merge loop. Bounded so an adversarial
 * high-cardinality column (random strings) degrades to recomputation, not
 * to memory growth.
 */
final class BpeMergeTable(val merges: Array[(String, String)]) extends Serializable {
  // key = length-prefixed concatenation: symbols may CONTAIN any character
  // (leading-space pre-tokens make " s" a symbol), so a plain delimiter
  // could collide ("a b"+"c" vs "a"+"b c"); the length prefix makes the
  // split point unambiguous
  private def key(l: String, r: String): String = l.length + ":" + l + r
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(key(merges(i)._1, merges(i)._2), Integer.valueOf(i))
      i += 1
    }
    m
  }
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 1 << 17

  def rankOf(l: String, r: String): Integer = rank.get(key(l, r))

  /** Encode one pre-token: repeatedly merge the lowest-rank adjacent pair
    * present, leftmost occurrence first (same pinned procedure as
    * [[graft.text.BpeReference.encodeWord]] and the DuckDB oracle CTE). */
  def encodeWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms = graft.text.BpeReference.charSplit(w)
    var continue = syms.length >= 2
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i + 1 < syms.length) {
        val rk = rankOf(syms(i), syms(i + 1))
        if (rk != null && rk.intValue() < bestRank) {
          bestRank = rk.intValue(); bestPos = i
        }
        i += 1
      }
      if (bestPos < 0) continue = false
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, bestPos)
        merged(bestPos) = syms(bestPos) + syms(bestPos + 1)
        System.arraycopy(syms, bestPos + 2, merged, bestPos + 1,
          syms.length - bestPos - 2)
        syms = merged
        continue = syms.length >= 2
      }
    }
    if (cache.size < CacheCap) cache.put(w, syms)
    syms
  }
}

/**
 * Shared interpreted/codegen implementation (standalone object → Java
 * static forwarder callable from generated code, the [[PolyHashImpl]]
 * idiom).
 */
object BpeEncodeImpl {
  private val Pre = java.util.regex.Pattern.compile(graft.text.TextOps.BpePattern)

  def encode(text: UTF8String, table: BpeMergeTable): ArrayData = {
    val m = Pre.matcher(text.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) {
      val syms = table.encodeWord(m.group())
      var i = 0
      while (i < syms.length) { out += UTF8String.fromString(syms(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  def count(text: UTF8String, table: BpeMergeTable): Int = {
    val m = Pre.matcher(text.toString)
    var n = 0
    while (m.find()) n += table.encodeWord(m.group()).length
    n
  }
}

/** BPE-encode a string column into its subword tokens (array<string>).
  * One pass per row inside whole-stage codegen; the merge table rides the
  * plan's reference array (one copy per executor, not per row). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val table = new BpeMergeTable(merges.toArray)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    BpeEncodeImpl.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.BpeEncodeImpl.encode($c, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMergeSeqApplyImpl {
  /** Apply each (l, r) merge once, in order, as a greedy left-to-right
    * pass — EXACTLY the training-state transition ([[graft.text
    * .BpeReference.mergePass]] chained; the pinned "one greedy pass per
    * merge" semantics), over a symbol array. */
  def apply(syms: ArrayData, merges: Array[(String, String)]): ArrayData = {
    var arr = new Array[String](syms.numElements())
    var i = 0
    while (i < arr.length) { arr(i) = syms.getUTF8String(i).toString; i += 1 }
    var m = 0
    while (m < merges.length) {
      arr = graft.text.BpeReference.mergePass(arr, merges(m)._1, merges(m)._2)
      m += 1
    }
    val out = new Array[Any](arr.length)
    i = 0
    while (i < arr.length) { out(i) = UTF8String.fromString(arr(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Sequential greedy merge passes over a symbol-array column — the
  * distributed BPE trainer's state transition as ONE codegen'd expression.
  * Replaces a chain of `aggregate(...)` HOF folds (one per pending merge):
  * the folds evaluate interpreted per row and nest the plan one level per
  * round, so each round re-analyzed/re-codegen'd an ever-deeper tree; this
  * kernel applies all pending merges in one compiled pass and the plan
  * stays one node deep regardless of how many merges are pending. */
case class BpeMergeSeqApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val table = merges.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_seq_apply"

  override def nullSafeEval(input: Any): Any =
    BpeMergeSeqApplyImpl.apply(input.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeMerges", table,
      "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.BpeMergeSeqApplyImpl.apply($c, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE token count without materializing the token array — the form
  * [[graft.pipeline.Corpus.packSequences]] consumes (the running-sum
  * window only needs the count). */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val table = new BpeMergeTable(merges.toArray)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeEncodeImpl.count(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.BpeEncodeImpl.count($c, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
