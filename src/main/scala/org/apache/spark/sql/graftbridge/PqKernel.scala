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

/**
 * Squared-euclidean distances from a float vector to EVERY centroid of a
 * flat [cell][dim] row-major table, as one native codegen'd expression
 * returning array<double> (index = cell id). The query-side sibling of
 * [[PqEncode]]'s m=1 argmin: IVF query routing needs the np SMALLEST
 * cells, so the distances come out of one kernel call (k · dim primitive
 * mul-adds over a single float[] reference) and the tiny k-element
 * struct-sort stays ordinary expression land. The array-of-per-centroid-
 * kernel-calls formulation this replaces carried k · dim literal nodes —
 * past whole-stage codegen's method budget at k = 256, where the whole
 * projection fell back to interpreted eval (the same flaw, measured 99×,
 * as the corpus-side assignment — see IvfIndex.assignCell). Same double
 * math in the same ascending order: distances bit-identical.
 */
case class CentroidDists(child: Expression, centroids: Array[Float],
    k: Int) extends UnaryExpression with ExpectsInputTypes {

  require(k > 0 && centroids.length % k == 0,
    s"flat centroid table length ${centroids.length} not divisible by k=$k")
  private val dim = centroids.length / k

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "centroid_dists"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      var p = 0
      val base = j * dim
      while (p < dim) {
        val t = x.getFloat(p).toDouble - centroids(base + p).toDouble
        acc += t * t
        p += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tab = ctx.addReferenceObj("centroidTable", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val p = ctx.freshName("p")
      val acc = ctx.freshName("acc"); val base = ctx.freshName("base")
      val t = ctx.freshName("t")
      s"""double[] $out = new double[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  double $acc = 0.0;
         |  int $base = $j * $dim;
         |  for (int $p = 0; $p < $dim; $p++) {
         |    double $t = (double) $a.getFloat($p) - (double) $tab[$base + $p];
         |    $acc += $t * $t;
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * The ADC coarse cosine as a native codegen'd expression: given a corpus
 * row's `codes` (array<int>, length m), a query's precomputed dot-product
 * lookup table `luts` (array<array<double>>, [m][ksub]) and query norm
 * `qNorm`, with the codebook-entry norms² riding as a flat reference
 * array — cos ≈ Σᵢ lut[i][codeᵢ] / (qNorm · √Σᵢ n2[i·ksub + codeᵢ]).
 *
 * This is the per-scored-row hot loop of every PQ top-k (corpus-sized at
 * 100 TB): m array lookups, one sqrt, one division — the HOF formulation
 * ([[graft.ann.PqCodebook.adcCosineHof]], kept as the differential
 * reference) pays interpreted lambda frames and boxed doubles per element.
 * Accumulation is double, left-to-right over i = 0..m-1 — identical fold
 * order, bit-identical scores (pinned in PqSpec). Zero denominator → 0.0,
 * matching the HOF's guard.
 */
case class PqAdc(codes: Expression, luts: Expression, qNorm: Expression,
    n2: Array[Double], ksub: Int) extends Expression with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(codes, luts, qNorm)
  override def inputTypes: Seq[AbstractDataType] = Seq(
    ArrayType(IntegerType),
    ArrayType(ArrayType(org.apache.spark.sql.types.DoubleType)),
    org.apache.spark.sql.types.DoubleType)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean =
    codes.nullable || luts.nullable || qNorm.nullable
  override def prettyName: String = "pq_adc_cosine"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = codes.eval(input)
    val l = luts.eval(input)
    val q = qNorm.eval(input)
    if (c == null || l == null || q == null) return null
    val ca = c.asInstanceOf[ArrayData]
    val la = l.asInstanceOf[ArrayData]
    val qn = q.asInstanceOf[Double]
    val mm = ca.numElements()
    var dot = 0.0
    var nn = 0.0
    var i = 0
    while (i < mm) {
      val code = ca.getInt(i)
      dot += la.getArray(i).getDouble(code)
      nn += n2(i * ksub + code)
      i += 1
    }
    val den = qn * math.sqrt(nn)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val n2Ref = ctx.addReferenceObj("pqN2", n2, "double[]")
    val evs = children.map(_.genCode(ctx))
    val (c, l, q) = (evs(0).value, evs(1).value, evs(2).value)
    val i = ctx.freshName("i"); val mm = ctx.freshName("mm")
    val cd = ctx.freshName("code"); val dot = ctx.freshName("dot")
    val nn = ctx.freshName("nn"); val den = ctx.freshName("den")
    val compute =
      s"""int $mm = $c.numElements();
         |double $dot = 0.0; double $nn = 0.0;
         |for (int $i = 0; $i < $mm; $i++) {
         |  int $cd = $c.getInt($i);
         |  $dot += $l.getArray($i).getDouble($cd);
         |  $nn += $n2Ref[$i * $ksub + $cd];
         |}
         |double $den = $q * java.lang.Math.sqrt($nn);
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;""".stripMargin
    if (nullable) {
      val nullCheck = evs.map(e => e.isNull.toString).mkString(" || ")
      ev.copy(code = code"""
        ${evs.map(_.code).mkString("\n")}
        boolean ${ev.isNull} = false;
        double ${ev.value} = 0.0;
        if ($nullCheck) {
          ${ev.isNull} = true;
        } else {
          $compute
        }""")
    } else {
      ev.copy(code = code"""
        ${evs.map(_.code).mkString("\n")}
        double ${ev.value} = 0.0;
        $compute""", isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(codes = newChildren(0), luts = newChildren(1), qNorm = newChildren(2))
}
