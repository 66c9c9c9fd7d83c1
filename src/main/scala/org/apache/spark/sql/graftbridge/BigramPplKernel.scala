// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, StringType}

/**
 * Per-document bigram negative-log-likelihood sums against a COLLECTED
 * language model — the narrow-map arm of [[graft.text.LangModel.score]].
 * The join arm streams one (id, hu, hb) row per scored bigram through two
 * hash joins and a per-doc aggregation; when the model's count tables fit
 * a driver collect (they are bounded by DISTINCT bigrams, not corpus
 * size — the caller probes with a limit-collect and falls back to the
 * join arm past the bound), scoring needs none of that: the tables ride
 * an ordinary Spark BROADCAST (a torrent-fetched handle, NOT task-binary
 * payload — executors fetch once per JVM) and each doc folds its own
 * bigram walk inside this kernel. No explode, no join, no shuffle; the
 * same shape that took text_classify from 32 s to 7 s at sf1.
 *
 * Bit-compat contract with the join arm (pinned in LangModelSpec):
 *  - hashes are Spark's own `xxhash64` chain, reproduced via the SAME
 *    [[XxHash64Function]]: hu = h(w1, seed=42), hb = h(w2, seed=hu) —
 *    exactly `xxhash64(w1)` / `xxhash64(w1, w2)`.
 *  - per-bigram term is −ln((c2+k)/(c1+k·V)) with c2/c1 = 0 on lookup
 *    miss, the same coalesce-to-0 double math.
 *  - the output is [Σ nll, count]; the caller divides and exp-rounds in
 *    expression land exactly like the join arm's `exp(avg(nll))`.
 *
 * Lookups are binary searches over sorted long arrays (the collected
 * count tables) — log₂(|bigrams|) probes per term, zero boxing.
 */
final class BigramTables(val hb: Array[Long], val c2: Array[Long],
    val hu: Array[Long], val c1: Array[Long], val v: Long, val k: Double)
    extends Serializable {
  require(hb.length == c2.length && hu.length == c1.length,
    "count arrays must parallel their key arrays")
}

object BigramPplImpl {
  private def lookup(keys: Array[Long], vals: Array[Long], key: Long): Long = {
    val i = java.util.Arrays.binarySearch(keys, key)
    if (i >= 0) vals(i) else 0L
  }

  def eval(tokens: ArrayData, t: BigramTables): ArrayData = {
    val n = tokens.numElements()
    var sum = 0.0
    var cnt = 0L
    if (n >= 2) {
      val ctxDen = // context denominator addend, hoisted: k·V
        t.k * t.v
      var prevHu = XxHash64Function.hash(tokens.getUTF8String(0), StringType, 42L)
      var i = 0
      while (i < n - 1) {
        val w2 = tokens.getUTF8String(i + 1)
        val hb = XxHash64Function.hash(w2, StringType, prevHu)
        val c2 = lookup(t.hb, t.c2, hb)
        val c1 = lookup(t.hu, t.c1, prevHu)
        sum += -math.log((c2 + t.k) / (c1 + ctxDen))
        cnt += 1
        prevHu = XxHash64Function.hash(w2, StringType, 42L)
        i += 1
      }
    }
    new GenericArrayData(Array[Any](sum, cnt.toDouble))
  }
}

case class BigramPpl(child: Expression, bc: Broadcast[BigramTables])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bigram_ppl"

  override def nullSafeEval(v: Any): Any =
    BigramPplImpl.eval(v.asInstanceOf[ArrayData], bc.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bigramBc", bc, classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.graftbridge.BigramPplImpl.eval($c,
         |  (org.apache.spark.sql.graftbridge.BigramTables) $b.value());""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
