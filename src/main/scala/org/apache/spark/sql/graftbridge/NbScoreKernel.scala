// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, StringType}

/**
 * Per-document Naive-Bayes log-likelihood sums as ONE native expression:
 * given a token array, fold every hashed unigram+bigram feature's
 * per-class ln(count+k) table entry into `classes` running sums — the
 * whole per-document inner loop of [[graft.text.Classify.predict]] with
 * ZERO row fan-out. The shuffle formulation this replaces exploded the
 * corpus into its feature stream (~2·tokens rows per doc), broadcast-
 * joined the pivoted model, and folded one groupBy(id) — correct, but
 * the corpus still paid an explode and a full shuffle whose payload was
 * one row per doc. This kernel reads the token array in place: the only
 * per-doc output is the (classes+1)-slot sum array, so corpus scoring is
 * a pure narrow map — no explode, no join, no shuffle, embarrassingly
 * parallel at any corpus size.
 *
 * The model rides the expression as a flat double[] of ln(cnt+k) in
 * [bucket][class] row-major order (buckets × classes ≤ B·C — model-
 * bounded, ~80 KB at B=10007, C=1digit) via one `ctx.addReferenceObj` —
 * same discipline as [[PqEncode]]'s codebook.
 *
 * Bit-compat contract with the shuffle formulation (pinned in
 * ClassifySpec's differential):
 *  - feature derivation is the house md5-prefix bucket
 *    (`conv(substring(md5(f),1,8),16,10) % B`, `Corpus.idBucket`):
 *    MD5 of the feature's UTF-8 bytes, first 4 bytes as an unsigned
 *    big-endian int, mod B. Bigrams are `tokᵢ + ' ' + tokᵢ₊₁` exactly
 *    like `concat_ws(" ", ...)`.
 *  - table entries are `Math.log(cnt + k)` with the add-k floor
 *    `Math.log(k)` for unseen (label, bucket) pairs — the same
 *    `log(coalesce(c, 0) + k)` double math.
 *  - sums fold in document feature order (unigrams then bigrams), a
 *    FIXED order where the groupBy's partial-aggregation order was
 *    arbitrary; both land within the engine's pinned 6-place argmax /
 *    4-place score rounding (the discipline that already made the
 *    shuffle path oracle-stable).
 *
 * Slot layout of the returned array<double>: [0, classes) = per-class
 * Σ ln(cnt+k); [classes] = the doc's feature count (dlen).
 */
final class NbModelTable(val lnTable: Array[Double], val buckets: Int,
    val classes: Int) extends Serializable {
  require(buckets >= 2 && classes >= 1 &&
    lnTable.length == buckets * classes,
    s"lnTable length ${lnTable.length} != buckets $buckets * classes $classes")
}

object NbScoreImpl {
  // MessageDigest is stateful and the expression instance (and thus the
  // reference-carried table) is shared across an executor's task threads
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First-8-hex-of-md5 of `bytes` as an unsigned int, mod `buckets` —
    * byte-level twin of `conv(substring(md5(x),1,8),16,10) % B`. */
  private def bucketOf(bytes: Array[Byte], buckets: Int): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (u % buckets).toInt
  }

  def score(tokens: ArrayData, t: NbModelTable): ArrayData = {
    val n = tokens.numElements()
    val c = t.classes
    val acc = new Array[Double](c + 1)
    val ln = t.lnTable
    // hold each token's UTF-8 bytes once; the bigram pass reuses them
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { // unigrams
      tb(i) = tokens.getUTF8String(i).getBytes
      val base = bucketOf(tb(i), t.buckets) * c
      var j = 0
      while (j < c) { acc(j) += ln(base + j); j += 1 }
      i += 1
    }
    i = 0
    while (i < n - 1) { // bigrams: tokᵢ ++ ' ' ++ tokᵢ₊₁
      val a = tb(i); val b = tb(i + 1)
      val f = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, f, 0, a.length)
      f(a.length) = ' '
      System.arraycopy(b, 0, f, a.length + 1, b.length)
      val base = bucketOf(f, t.buckets) * c
      var j = 0
      while (j < c) { acc(j) += ln(base + j); j += 1 }
      i += 1
    }
    acc(c) = (n + math.max(0, n - 1)).toDouble // dlen = |unigrams| + |bigrams|
    new GenericArrayData(acc)
  }
}

case class NbScore(child: Expression, table: NbModelTable)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "nb_score"

  override def nullSafeEval(v: Any): Any =
    NbScoreImpl.score(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("nbTable", table, classOf[NbModelTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftbridge.NbScoreImpl.score($c, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
