// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/**
 * Sign-LSH band values for one float vector as ONE native pass: all
 * `planes` hyperplane dot products (double math, index order — the same
 * left fold as `aggregate(zip_with(vec, w, x·w), 0.0, +)`), sign bits
 * grouped `bandBits` per band, little-endian within the band (bit k
 * weighs 2ᵏ — exactly the `Σ bitᵢ·(1L<<k)` Column assembly this
 * replaces). The HOF formulation ran `planes` interpreted aggregate/
 * zip_with folds per row plus the band-struct assembly; this kernel is
 * two tight loops over one flat [plane][dim] double[] carried as a
 * single reference object ([[PqEncode]]'s codebook discipline).
 * Band-for-band equality with the Column formulation is pinned in
 * DedupSpec. Output: array<long> of length planes/bandBits, band index
 * = array position (callers posexplode).
 */
case class SignBands(child: Expression, mat: Array[Double], planes: Int,
    bandBits: Int) extends UnaryExpression with ExpectsInputTypes {

  require(planes > 0 && bandBits > 0 && planes % bandBits == 0 &&
    mat.length % planes == 0,
    s"bad geometry: planes=$planes bandBits=$bandBits |mat|=${mat.length}")
  private val dim = mat.length / planes

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val nb = planes / bandBits
    val out = new Array[Long](nb)
    var p = 0
    while (p < planes) {
      var acc = 0.0
      val base = p * dim
      var j = 0
      while (j < dim) {
        acc += x.getFloat(j).toDouble * mat(base + j)
        j += 1
      }
      if (acc >= 0) out(p / bandBits) += 1L << (p % bandBits)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBands", this, classOf[SignBands].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  ((${classOf[SignBands].getName}) $ref).nullSafeEval($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
