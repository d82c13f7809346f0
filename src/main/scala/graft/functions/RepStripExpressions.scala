package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repeated-span removal kernel — the native engine
  * behind `Pipeline.repStrip` (`x_rep_strip`): given a document's
  * token array, drop every token covered by a [[RepStripTokens.K]]-word
  * span occurrence that REPEATS an earlier span of the SAME document
  * (the first occurrence keeps its tokens; every later occurrence of
  * the same K-token window is cut). This is the C4/RefinedWeb
  * within-page repeated-line/paragraph strip — the within-document
  * transform dual of the cross-document `x_span_strip` surgery.
  *
  * Why a native Catalyst `Expression` rather than the composed
  * built-ins (`filter(sequence(...), i -> exists(sequence(0, i-1),
  * j -> span(j) == span(i)))`): the HOF form is O(spans²) string
  * compares per row — exactly quadratic on the highly-repetitive
  * documents this operator exists to clean — and higher-order-function
  * lambdas are not codegen'd, so every compare pays the interpreted
  * expression tree. This kernel is ONE pass per row: a hash map of
  * first-seen span keys (O(tokens · span_len) work), coverage marked
  * in a difference array, kept tokens swept out by a prefix sum.
  * Row-local with NO shuffle at any corpus size; the surrounding
  * stage stays in whole-stage codegen via the static-call wrapper
  * (the [[CdcStarts]] pattern).
  *
  * Semantics pinned for cross-engine parity (the DuckDB oracle
  * derives the identical result from positional list ops): span key =
  * the K tokens joined with a single space (tokens come from a
  * single-space split, so the join is unambiguous); occurrence at
  * position i repeats iff some j < i has the same key; token t is
  * removed iff some repeating occurrence i covers it (i ≤ t ≤ i+K−1)
  * — including tokens the first occurrence also covers. Arrays under K
  * tokens have no spans and pass through; a NULL array is NULL
  * (UnaryExpression null-safe contract); a null ELEMENT participates
  * in span keys as the empty string and is kept/cut like any token
  * (split() never emits nulls — the rule exists so corrupt input
  * cannot crash the kernel). RepStripSpec pins kernel ≡ composed-HOF
  * parity on seeded corpora plus hand fixtures (overlap, all-same
  * token, sub-span docs, multibyte).
  */
case class RepStripTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_rep_strip"

  override def nullSafeEval(a: Any): Any =
    RepStripTokens.compute(a.asInstanceOf[ArrayData])

  // one static call — the loop lives in compiled Scala, the wrapper
  // keeps the surrounding stage in whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.RepStripTokens.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepStripTokens {
  /** Span length in tokens — 3, the SHINGLE length the whole lexical
    * family blocks on, NOT the cross-doc 5-word span: within-document
    * repetition operates at a finer granularity than cross-document
    * copying (a repeated navigation fragment inside one page is
    * shorter than a copied paragraph across pages), and on measured
    * corpora the 5-word within-doc repeat essentially never occurs
    * while the 3-token repeat is the standing boilerplate signal
    * (fixture: 27 / 287 affected docs at sf0.01 / sf0.1 at K=3, zero
    * at K=5 — an operator whose oracle row can never fire is untested
    * plumbing). K=2 over-cuts: repeated bigrams are ordinary language,
    * not boilerplate.
    */
  val K = 3

  private val SEP = UTF8String.fromString(" ")

  /** Interpreted kernel shared by eval and codegen. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // null elements participate as the empty string (split() never
      // produces them; the guard keeps corrupt input non-fatal)
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
        else arr.getUTF8String(i)
      i += 1
    }
    if (n < K) return new GenericArrayData(toks.asInstanceOf[Array[Any]])
    // first pass: hash each span's joined key; a repeat marks its
    // coverage in the difference array
    val seen = new java.util.HashMap[UTF8String, Integer](n * 2)
    val cov = new Array[Int](n + 1)
    var p = 0
    val last = n - K
    var removedAny = false
    // the key window is built over the same K the loop bound and the
    // coverage marks use, so a K change cannot desynchronize them
    val window = new Array[UTF8String](K)
    while (p <= last) {
      var w = 0
      while (w < K) { window(w) = toks(p + w); w += 1 }
      val span = UTF8String.concatWs(SEP, window: _*)
      if (seen.putIfAbsent(span, p) != null) {
        cov(p) += 1
        cov(p + K) -= 1
        removedAny = true
      }
      p += 1
    }
    if (!removedAny) return new GenericArrayData(toks.asInstanceOf[Array[Any]])
    // second pass: prefix-sum the coverage, keep uncovered tokens
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

object RepStripFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Function descriptions for [[graft.GraftExtensions]]. */
  def injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_rep_strip"),
        new ExpressionInfo(classOf[RepStripTokens].getName, "graft_rep_strip"),
        exprs => RepStripTokens(exprs(0))))

  /** Idempotent session registration (also usable from SQL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rep_strip", exprs => RepStripTokens(exprs(0)), "built-in")

  def repStrip(spark: SparkSession, tokens: Column): Column = {
    register(spark)
    call_function("graft_rep_strip", tokens)
  }
}
