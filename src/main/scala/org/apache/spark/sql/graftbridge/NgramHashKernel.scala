// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Word n-gram xxhash64 values straight from the token array — ONE native
 * pass replacing the `explode(transform(slice→array_join)) → xxhash64`
 * pipeline at the base of every shingle operator (Jaccard/MinHash
 * candidate generation, decontamination, the per-row streaming
 * signature). The Column formulation materializes every n-gram STRING
 * (an interpreted array_join per position, then a string-payload explode
 * whose rows exist only to be hashed); this kernel hashes the n-gram's
 * exact byte image (tokens joined by 0x20 — including empty tokens,
 * which Spark's limit=-1 split can produce) without ever allocating the
 * joined string, and the explode that follows carries 8-byte longs.
 *
 * Bit-compat: hash = `xxhash64(array_join(slice(tokens,i,n), " "))` —
 * [[XxHash64Function]] over the identical UTF-8 bytes with the same
 * seed 42, pinned against the Column formulation in DedupSpec. Fewer
 * than n tokens → empty array (the `ngrams` contract).
 */
object NgramHashImpl {
  /** The shared hashing pass: the doc's n-gram xxhash64 values in
    * position order (empty for fewer than n tokens). Both [[NgramHash]]
    * and [[NgramHashCounts]] route through here, so they can never
    * disagree about what a gram hashes to. */
  def hashes(toks: ArrayData, n: Int): Array[Long] = {
    val m = toks.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) Array.emptyLongArray
    else {
      val tb = new Array[Array[Byte]](m)
      var i = 0
      while (i < m) { tb(i) = toks.getUTF8String(i).getBytes; i += 1 }
      val out = new Array[Long](cnt)
      var p = 0
      while (p < cnt) {
        var len = n - 1 // the n-1 joining spaces
        var j = 0
        while (j < n) { len += tb(p + j).length; j += 1 }
        val g = new Array[Byte](len)
        var off = 0
        j = 0
        while (j < n) {
          val t = tb(p + j)
          System.arraycopy(t, 0, g, off, t.length)
          off += t.length
          if (j < n - 1) { g(off) = ' '; off += 1 }
          j += 1
        }
        out(p) = XxHash64Function.hash(UTF8String.fromBytes(g), StringType, 42L)
        p += 1
      }
      out
    }
  }
}

case class NgramHash(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(NgramHashImpl.hashes(v.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramHash", this, classOf[NgramHash].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  ((${classOf[NgramHash].getName}) $ref).nullSafeEval($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Per-document n-gram hash COUNTS — [[NgramHash]] with the per-doc
 * aggregation folded into the kernel: the doc's gram hashes, sorted and
 * run-length encoded into (hash, count) pairs. The explode that follows
 * then emits one row per DISTINCT gram per document instead of one per
 * OCCURRENCE — on corpus-distribution jobs
 * ([[graft.pipeline.Overlap.tokenDrift]]) that shrinks the exploded row
 * stream (and the partial-aggregation hash-map traffic feeding the
 * (slice, hash) shuffle) by the per-document token duplication factor,
 * while downstream per-slice sums of `c` are value-identical to counting
 * occurrence rows (pinned in OverlapSpec's differential).
 *
 * Same gram byte image and hash as [[NgramHash]] (tokens joined by 0x20,
 * xxhash64 seed 42) — the kernels can never disagree about what a gram
 * hashes to. Fewer than n tokens → empty array. The per-doc sort is
 * native long[] sorting, O(L log L) on the document's own grams — cheap
 * next to the hash-map updates it replaces.
 */
case class NgramHashCounts(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ngram_hash_counts"

  override def nullSafeEval(v: Any): Any = {
    val hs = NgramHashImpl.hashes(v.asInstanceOf[ArrayData], n)
    val cnt = hs.length
    if (cnt == 0) new GenericArrayData(Array.empty[Any])
    else {
      java.util.Arrays.sort(hs)
      val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(cnt, 16))
      var i = 0
      while (i < cnt) {
        var j = i + 1
        while (j < cnt && hs(j) == hs(i)) j += 1
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](hs(i), (j - i).toLong))
        i = j
      }
      new GenericArrayData(out.toArray)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramHashCounts", this,
      classOf[NgramHashCounts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  ((${classOf[NgramHashCounts].getName}) $ref).nullSafeEval($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * The resolve pass of the heavy-hitter top-k ([[graft.text.HeavyHitters]]):
 * the word n-grams of a token array WHOSE HASH IS IN `candidates`, as
 * strings. Same gram byte image and hash as [[NgramHash]] (tokens joined
 * by 0x20, xxhash64 seed 42 — the two kernels can never disagree about
 * what a gram hashes to), but the joined string is only materialized for
 * grams that survive the membership test — on a heavy-hitter resolve pass
 * that's the candidate set's occurrences, not the corpus's full gram
 * stream. Membership is binary search over the sorted candidate array
 * (the set is k + kth-count ties — driver-bounded by construction).
 */
case class NgramResolve(child: Expression, n: Int,
    candidates: Array[Long]) extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"n must be >= 1, got $n")
  private val sorted: Array[Long] = {
    val c = candidates.clone(); java.util.Arrays.sort(c); c
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_resolve"

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val tb = new Array[Array[Byte]](m)
      var i = 0
      while (i < m) { tb(i) = toks.getUTF8String(i).getBytes; i += 1 }
      val out = new scala.collection.mutable.ArrayBuffer[Any](4)
      var p = 0
      while (p < cnt) {
        var len = n - 1
        var j = 0
        while (j < n) { len += tb(p + j).length; j += 1 }
        val g = new Array[Byte](len)
        var off = 0
        j = 0
        while (j < n) {
          val t = tb(p + j)
          System.arraycopy(t, 0, g, off, t.length)
          off += t.length
          if (j < n - 1) { g(off) = ' '; off += 1 }
          j += 1
        }
        val s = UTF8String.fromBytes(g)
        if (java.util.Arrays.binarySearch(sorted,
            XxHash64Function.hash(s, StringType, 42L)) >= 0) out += s
        p += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramResolve", this,
      classOf[NgramResolve].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  ((${classOf[NgramResolve].getName}) $ref).nullSafeEval($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
