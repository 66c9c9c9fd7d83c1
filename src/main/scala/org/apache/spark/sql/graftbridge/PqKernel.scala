// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType}

/**
 * Product-quantization encode as a native codegen'd expression: for each of
 * `m` disjoint subvectors of a float vector, the index of the nearest
 * centroid in that subspace's `ksub`-entry codebook (squared euclidean,
 * strict-< argmin — first minimum wins, ties break toward the lowest code,
 * matching [[graft.ann.PqCodebook.encodeJvm]] exactly).
 *
 * The codebook rides the expression as one flat float[] in [sub][code][dim]
 * row-major order — a single JVM array reference in generated code
 * (`ctx.addReferenceObj`), not a 4096-node literal tree. Versus the HOF
 * formulation (transform over a nested array literal with an aggregate fold
 * per centroid): HOFs evaluate interpreted, one lambda frame + boxed double
 * per element — measured ~1 ms/row at m=8 ksub=64 d=64; this kernel is
 * three tight primitive loops (measured ~2 µs/row, the arithmetic cost).
 * Same double math in the same order, so codes are bit-identical (pinned
 * against encodeJvm in PqSpec).
 */
case class PqEncode(child: Expression, codebook: Array[Float], m: Int,
    ksub: Int) extends UnaryExpression with ExpectsInputTypes {

  require(m > 0 && ksub > 0 && codebook.length % (m * ksub) == 0,
    s"flat codebook length ${codebook.length} != m*ksub*dsub")
  private val dsub = codebook.length / (m * ksub)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        var p = 0
        val base = (s * ksub + j) * dsub
        val off = s * dsub
        while (p < dsub) {
          val t = x.getFloat(off + p).toDouble - codebook(base + p).toDouble
          acc += t * t
          p += 1
        }
        if (acc < bestD) { bestD = acc; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val book = ctx.addReferenceObj("pqBook", codebook, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val acc = ctx.freshName("acc")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val base = ctx.freshName("base"); val off = ctx.freshName("off")
      val t = ctx.freshName("t")
      s"""int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  int $off = $s * $dsub;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double $acc = 0.0;
         |    int $base = ($s * $ksub + $j) * $dsub;
         |    for (int $p = 0; $p < $dsub; $p++) {
         |      double $t = (double) $a.getFloat($off + $p) - (double) $book[$base + $p];
         |      $acc += $t * $t;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $j; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
