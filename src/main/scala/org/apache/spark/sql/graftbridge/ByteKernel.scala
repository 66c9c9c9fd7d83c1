// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/**
 * Unsigned byte-sum of a BINARY column as a native codegen'd expression —
 * the payload-checksum primitive the multimodal surface leans on (frame /
 * resize verification). The higher-order formulation
 * (`aggregate(transform(sequence(...)), conv(substr(hex(bin))))`) expands
 * the payload to a hex STRING and re-parses two chars per byte: O(len)
 * string allocation + integer parsing per row, measured as the whole cost
 * of the mm_resize bench entry. This is one tight loop over the raw bytes.
 */
case class ByteSum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc += (bytes(i) & 0xffL); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""long $acc = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $acc += ($b[$i] & 0xffL);
         |}
         |${ev.value} = $acc;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
