package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's classic Column internals (Column ↔ Expression),
  * which are `private[sql]` — the one sanctioned way for a library to attach
  * custom Catalyst expressions without a session-level function registry. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Driver-side evaluation of CONSTANT Column expressions (literal-only
    * subtrees — e.g. a hash-derived hyperplane matrix): one analyzer pass
    * over a single Project resolves every function/type, then each
    * expression is evaluated INTERPRETIVELY — milliseconds total, zero
    * Spark jobs. The `range(1).select(cols).head` formulation this replaces
    * pays analyze + optimize + whole-stage-codegen + job-submit to compute
    * the same constants (measured 0.6-0.8 s warm for a 1024-column matrix).
    * Expressions must reference no input columns; anything unresolvable or
    * attribute-bearing throws here, at the caller, not inside a task. */
  def evalConstants(spark: org.apache.spark.sql.SparkSession,
      cols: Seq[Column]): Seq[Any] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{OneRowRelation, Project}
    // convert eagerly (ColumnNodeToExpressionConverter) rather than via
    // ExpressionUtils.expression: the latter wraps the node in a LAZY
    // ColumnNodeExpression that only converts inside the session's own
    // query execution — it reports resolved but throws Unevaluable on a
    // direct eval
    val plan = Project(
      cols.zipWithIndex.map { case (c, i) =>
        Alias(org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node), s"c$i")()
      },
      OneRowRelation())
    val analyzed = spark.sessionState.analyzer.execute(plan)
    spark.sessionState.analyzer.checkAnalysis(analyzed)
    analyzed.asInstanceOf[Project].projectList
      .map(a => a.asInstanceOf[Alias].child.eval(InternalRow.empty))
  }

  /** Unpersist the block-manager storage behind a `localCheckpoint()`ed
    * frame. A local checkpoint persists its internal RDD (MEMORY_AND_DISK)
    * and nothing releases it until the driver GCs the Dataset — an
    * iterative trainer that checkpoints per iteration accumulates every
    * iteration's copy in executor storage. `Dataset.unpersist` only
    * consults the CacheManager (plan-fingerprint cache), not RDD-level
    * persistence, so the release has to reach the LogicalRDD's rdd
    * directly — which is what this does. Safe on any frame: non-LogicalRDD
    * plans are left untouched; blocking=false (fire-and-forget, like every
    * unpersist in this library). */
  def releaseLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Unload every loaded streaming state-store provider and stop the
    * maintenance thread (they restart lazily on the next streaming query).
    * A short-lived replay harness otherwise leaves providers + a periodic
    * disk-touching maintenance task resident in a long-lived session —
    * unattributable pressure on whatever runs after it in a bench JVM. */
  def unloadStreamingStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
