package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential (left-to-right) dot product of two float-array columns,
  * accumulated in double.
  *
  * Why a native Catalyst `Expression` rather than composed built-ins:
  * an explicit 64-term `a[1]*b[1] + … + a[64]*b[64]` expression tree
  * blows whole-stage codegen past janino's method limit (observed:
  * `InternalCompilerException` → interpreted fallback), and
  * `aggregate(zip_with(...))` higher-order functions are not codegen'd
  * at all. This expression emits a tight loop, keeps the whole stage in
  * codegen, and evaluates in a fixed element order so results are
  * bit-identical to the oracle's left-associated SQL sum chain — on any
  * cluster size, since per-row evaluation is partition-independent.
  *
  * Semantics: `Σ_i (double)a[i] * (double)b[i]` for i over the shorter
  * length; null if either side or any touched element is null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Not ExpectsInputTypes: its inputTypes signature needs
  // AbstractDataType, which is private[sql] in Spark 4.1 and thus
  // unnameable from this package. Validate with public types instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $sum += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Function descriptions for [[graft.GraftExtensions]]
    * (`spark.sql.extensions`-based injection). */
  def injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      exprs => DotProduct(exprs(0), exprs(1))))

  /** Idempotently registers graft's native expressions with the session
    * function registry (also usable from SQL as `graft_dot(a, b)`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_dot", a, b)
  }
}
