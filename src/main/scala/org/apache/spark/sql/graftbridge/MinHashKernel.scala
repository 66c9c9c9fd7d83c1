// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/**
 * MinHash signature over a shingle-hash array as ONE native pass: for
 * each of `numHashes` universal-hash permutations (aᵢ·h′ + bᵢ mod p,
 * h′ = pmod(h, p)), the minimum over the array. The Column formulation
 * this backs ([[graft.dedup.Dedup.minHashSignature]] and the batch/index
 * signature projections) is `numHashes` separate `array_min(transform(…))`
 * passes — every lambda interpreted, numHashes × |set| boxed evaluations
 * per doc; this kernel reads each element once and updates all
 * `numHashes` minima in the inner loop (compiled, zero boxing).
 *
 * Bit-compat: Java floorMod equals Spark pmod for positive p, and
 * `pmod(pmod(h,p)·a + b, p)` is computed in the same long arithmetic
 * (a < 2²¹, h′ < 2³¹ ⇒ products stay ≪ 2⁶³) — signatures are
 * value-identical to the HOF formulation (pinned in DedupSpec), so
 * persisted MinHash index artifacts remain probe-compatible across the
 * change. Empty arrays yield NULL (the "fewer than n tokens" contract);
 * duplicates in a raw multiset input can't move a min, so the same
 * kernel serves both the distinct-set and per-row paths.
 */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long],
    p: Long) extends UnaryExpression with ExpectsInputTypes {

  require(a.length == b.length && a.nonEmpty && p > 0,
    s"bad permutation table: |a|=${a.length} |b|=${b.length} p=$p")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // an EMPTY shingle array yields NULL even when the input itself can't be
  // null, so nullability does NOT follow the child. Without this override
  // two things break when the child is non-nullable: (1) the planner may
  // fold away IsNotNull guards on the signature, and (2) nullSafeCodeGen
  // swaps ev.isNull for a constant while doGenCode's template still
  // assigns it — janino rejects the undeclared name and the WHOLE STAGE
  // (Generate + its fused parents) silently falls back to interpreted
  // execution on every signature scan.
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) null
    else {
      val k = a.length
      val out = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val hr = java.lang.Math.floorMod(hs.getLong(i), p)
        var j = 0
        while (j < k) {
          val v2 = java.lang.Math.floorMod(hr * a(j) + b(j), p)
          if (v2 < out(j)) out(j) = v2
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sigResult")
      s"""Object $r = ((${classOf[MinHashSig].getName}) $ref).nullSafeEval($c);
         |if ($r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r;
         |}""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
