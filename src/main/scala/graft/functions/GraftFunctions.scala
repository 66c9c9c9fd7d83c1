package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graftbridge.{ByteSum, ColumnBridge, FloatVecKernel, LongSetIntersectCount, NfcNormalize, PolyHash, Sq8Cosine, VecOp}

/**
 * SQL-surface registration for the native similarity kernels, so
 * `spark.sql("SELECT graft_cosine(a, b) ...")` works alongside the Column
 * API:
 *
 *  - session-level: `GraftFunctions.register(spark)`;
 *  - config-level: `spark.sql.extensions=graft.functions.GraftExtensions`
 *    (the `SparkSessionExtensions` injection point for custom expressions).
 */
object GraftFunctions {

  val all: Seq[(String, VecOp)] = Seq(
    "graft_dot" -> VecOp.Dot,
    "graft_cosine" -> VecOp.Cosine,
    "graft_sqeuclidean" -> VecOp.SqEuclidean)

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[FloatVecKernel].getName, name)

  private def builder(op: VecOp): Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"${op.opName} takes exactly 2 array<float> arguments")
    FloatVecKernel(args.head, args(1), op)
  }

  /** Let-binding for Column expressions: evaluates `v` ONCE per row and
    * hands the bound value to `body` as a higher-order-function lambda
    * variable. Why it exists: outside whole-stage codegen (HOF subtrees are
    * interpreted, with no common-subexpression elimination) every TEXTUAL
    * reference to a Column re-evaluates its entire subtree — and a
    * reference from inside a transform/aggregate lambda re-evaluates it
    * PER ELEMENT, turning an O(k) array expression into O(k²). Binding
    * through a single-element `transform(array(v), body)[1]` makes the
    * evaluation count explicit (measured: ngrams 8× — the token split was
    * being re-run for every produced n-gram). Note `v = null` reaches
    * `body` as a null element; handle it there if the source is nullable. */
  def bind(v: org.apache.spark.sql.Column)(
      body: org.apache.spark.sql.Column => org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, element_at, transform}
    element_at(transform(array(v), body), 1)
  }

  /** Unsigned byte-sum of a BINARY column (payload checksums) — Column API
    * over the native [[ByteSum]] expression. */
  def byteSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ColumnBridge.column(ByteSum(ColumnBridge.expression(c)))

  /** Rolling-hash document fingerprint of a STRING column — Column API over
    * the native [[PolyHash]] expression. */
  def polyHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))

  private val polyHashInfo =
    new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash")
  private val polyHashBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "graft_poly_hash takes exactly 1 string argument")
    PolyHash(args.head)
  }

  private val byteSumInfo =
    new ExpressionInfo(classOf[ByteSum].getName, "graft_byte_sum")
  private val byteSumBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "graft_byte_sum takes exactly 1 binary argument")
    ByteSum(args.head)
  }

  private val sq8Info =
    new ExpressionInfo(classOf[Sq8Cosine].getName, "graft_sq8_cosine")
  private val sq8Builder: Seq[Expression] => Expression = { args =>
    require(args.length == 6,
      "graft_sq8_cosine takes (codesA, mnA, mxA, codesB, mnB, mxB)")
    Sq8Cosine(args(0), args(1), args(2), args(3), args(4), args(5))
  }

  private val interInfo = new ExpressionInfo(
    classOf[LongSetIntersectCount].getName, "graft_intersect_count")
  private val interBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2,
      "graft_intersect_count takes exactly 2 array<bigint> SET arguments")
    LongSetIntersectCount(args.head, args(1))
  }

  private val nfcInfo =
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc")
  private val nfcBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "graft_nfc takes exactly 1 string argument")
    NfcNormalize(args.head)
  }

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, op) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name), builder(op))
    }
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_byte_sum"), byteSumInfo, byteSumBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_poly_hash"), polyHashInfo, polyHashBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sq8_cosine"), sq8Info, sq8Builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_intersect_count"), interInfo, interBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_nfc"), nfcInfo, nfcBuilder)
  }

  /** Inject into a SparkSessionExtensions (spark.sql.extensions path). */
  def inject(extensions: SparkSessionExtensions): Unit = {
    all.foreach { case (name, op) =>
      extensions.injectFunction((FunctionIdentifier(name), info(name), builder(op)))
    }
    extensions.injectFunction(
      (FunctionIdentifier("graft_byte_sum"), byteSumInfo, byteSumBuilder))
    extensions.injectFunction(
      (FunctionIdentifier("graft_poly_hash"), polyHashInfo, polyHashBuilder))
    extensions.injectFunction(
      (FunctionIdentifier("graft_sq8_cosine"), sq8Info, sq8Builder))
    extensions.injectFunction(
      (FunctionIdentifier("graft_intersect_count"), interInfo, interBuilder))
    extensions.injectFunction(
      (FunctionIdentifier("graft_nfc"), nfcInfo, nfcBuilder))
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.inject(extensions)
}
