// lives inside org.apache.spark.sql so it can extend ExpectsInputTypes
// (AbstractDataType is private[sql]); the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/**
 * |A ∩ B| over two ARRAY<LONG> SET columns without materializing the
 * intersection — the hot expression of the exact-Jaccard verification join
 * ([[graft.dedup.Dedup]]): `size(array_intersect(ha, hb))` builds a hash
 * set AND allocates the full intersection array per candidate pair just to
 * take its length; at sf0.1 the simhash arm alone runs it over ~360k
 * pruned candidates × multi-hundred-element shingle sets.
 *
 * Contract: inputs are DISTINCT-element arrays (the per-doc shingle sets
 * are `collect_set` outputs by construction), so counting elements of one
 * side found in the other IS the distinct intersection cardinality —
 * exactly `size(array_intersect(...))` on set inputs (DedupSpec pins the
 * equality; on non-set inputs the two differ and this kernel is not the
 * right tool). Implementation: copy + sort the SMALLER side (primitive
 * long[], no boxing), binary-search each element of the larger — O((n+m)
 * log min(n,m)), zero allocation beyond the scratch copy. Null-safe: null
 * on either side → null, matching array_intersect.
 */
case class LongSetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_set_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (small, large) =
      if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val n = small.numElements()
    if (n == 0) return 0L
    val sorted = new Array[Long](n)
    var i = 0
    while (i < n) { sorted(i) = small.getLong(i); i += 1 }
    java.util.Arrays.sort(sorted)
    var cnt = 0L
    val m = large.numElements()
    i = 0
    while (i < m) {
      if (java.util.Arrays.binarySearch(sorted, large.getLong(i)) >= 0) cnt += 1L
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val small = ctx.freshName("small"); val large = ctx.freshName("large")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val sorted = ctx.freshName("sorted"); val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt"); val tmp = ctx.freshName("tmp")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $small = $a;
         |org.apache.spark.sql.catalyst.util.ArrayData $large = $b;
         |if ($small.numElements() > $large.numElements()) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $tmp = $small;
         |  $small = $large; $large = $tmp;
         |}
         |int $n = $small.numElements();
         |int $m = $large.numElements();
         |long $cnt = 0L;
         |if ($n > 0) {
         |  long[] $sorted = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) { $sorted[$i] = $small.getLong($i); }
         |  java.util.Arrays.sort($sorted);
         |  for (int $i = 0; $i < $m; $i++) {
         |    if (java.util.Arrays.binarySearch($sorted, $large.getLong($i)) >= 0) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
