package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Span-coverage strip kernel — the native engine behind
  * `Pipeline.stripCoverageProjection` (`x_span_strip`, `x_contam_strip`):
  * given a document's token array and the start positions of flagged
  * spans, drop every token covered by a flagged span of `cover + 1`
  * tokens (token j is removed iff some flag x has x ≤ j ≤ x + cover).
  *
  * Why a native Catalyst `Expression` rather than the staged HOF it
  * replaces (`filter(w, (t, j) -> !exists(fl, x -> x <= j <= x+cover))`):
  * the HOF form is O(tokens × |fl|) interpreted lambda dispatches per
  * row — quadratic exactly on the heavily-flagged documents the strip
  * exists to clean — and higher-order-function lambdas are not
  * codegen'd, so every membership test pays an interpreted expression
  * tree (the [[RepStripTokens]] / [[CdcStarts]] rationale). This kernel
  * is ONE pass per row: flags marked in a difference array
  * (O(|fl|)), kept tokens swept out by a running coverage sum
  * (O(tokens)). Row-local with NO shuffle at any corpus size; the
  * static-call wrapper keeps the surrounding stage in whole-stage
  * codegen.
  *
  * Semantics pinned for parity with the HOF form (StripCoverageSpec):
  * kept tokens preserve order and identity (null elements pass by
  * position, as in `filter`); flag positions outside [0, n) cannot
  * occur (they come from a posexplode over the SAME tokenization) but
  * are clamped defensively; an empty flag array keeps every token;
  * NULL inputs return NULL (TernaryExpression null-safe contract — the
  * caller guards NULL `fl` with a when() that also passes the original
  * text through untouched).
  */
case class StripCoverageTokens(
    first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<bigint>, int), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_strip_coverage"

  override def nullSafeEval(toks: Any, flags: Any, cover: Any): Any =
    StripCoverageTokens.compute(toks.asInstanceOf[ArrayData],
      flags.asInstanceOf[ArrayData], cover.asInstanceOf[Int])

  // one static call — the loop lives in compiled Scala, the wrapper
  // keeps the surrounding stage in whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, f, c) =>
      s"${ev.value} = graft.functions.StripCoverageTokens.compute($t, $f, $c);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object StripCoverageTokens {
  /** Interpreted kernel shared by eval and codegen. */
  def compute(arr: ArrayData, flags: ArrayData, cover: Int): ArrayData = {
    val n = arr.numElements()
    val cov = new Array[Int](n + 1)
    var any = false
    var k = 0
    val m = flags.numElements()
    while (k < m) {
      // flag elements are collect_set output (never null); the guard
      // keeps corrupt input non-fatal rather than semantic
      if (!flags.isNullAt(k)) {
        val x = flags.getLong(k)
        if (x < n && x + cover >= 0) {
          val lo = math.max(x, 0L).toInt
          val hi = math.min(x + cover + 1L, n.toLong).toInt
          cov(lo) += 1
          cov(hi) -= 1
          any = true
        }
      }
      k += 1
    }
    val toks = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (!any) return new GenericArrayData(toks.asInstanceOf[Array[Any]])
    val kept = new Array[AnyRef](n)
    var cnt = 0
    var run = 0
    i = 0
    while (i < n) {
      run += cov(i)
      if (run == 0) { kept(cnt) = toks(i); cnt += 1 }
      i += 1
    }
    new GenericArrayData(
      java.util.Arrays.copyOf(kept, cnt).asInstanceOf[Array[Any]])
  }
}

object StripCoverageFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Function descriptions for [[graft.GraftExtensions]]. */
  def injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_strip_coverage"),
        new ExpressionInfo(classOf[StripCoverageTokens].getName,
          "graft_strip_coverage"),
        exprs => StripCoverageTokens(exprs(0), exprs(1), exprs(2))))

  /** Idempotent session registration (also usable from SQL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_strip_coverage",
      exprs => StripCoverageTokens(exprs(0), exprs(1), exprs(2)), "built-in")

  def stripCoverage(spark: SparkSession, tokens: Column, flags: Column,
      cover: Column): Column = {
    register(spark)
    call_function("graft_strip_coverage", tokens, flags, cover)
  }
}
