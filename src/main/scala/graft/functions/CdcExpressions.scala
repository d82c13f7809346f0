package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk-start positions of a text column — the native
  * kernel behind `Pipeline.cdcStarts`.
  *
  * Why a native Catalyst `Expression` rather than the composed
  * built-ins it replaces (`filter(sequence(...), p -> md5(substr(t, p,
  * W)) ...)`): higher-order-function lambdas are not codegen'd, so the
  * per-position boundary test paid an interpreted expression tree —
  * UTF8String substring allocation, hex-string md5, BigInteger `conv`
  * — per CHARACTER of corpus text (measured 10 s for the sf0.1 chunk
  * inventory). This kernel makes one pass per row: char→byte offsets
  * computed once, a thread-local MessageDigest hashing each W-char
  * window in place, and the mask test reading the digest's first two
  * BYTES (`(d0<<8 | d1) % MOD` — exactly `conv(substring(md5_hex, 1,
  * 4), 16, 10) % MOD`, since 4 hex digits are 2 bytes). Semantics are
  * byte-identical to the composed form and the DuckDB oracle:
  * candidate positions `[2, n-W+1]` in CODEPOINTS (UTF-8 lead-byte
  * scan, agreeing with both engines' character `substr`/`length`),
  * windows hashed as UTF-8 bytes, output `[1] ++ boundaries`
  * ascending, NULL text → NULL (UnaryExpression null-safe eval; the
  * composed reference carries a matching `isNotNull` guard). CdcSpec
  * pins kernel ≡ composed-builtins parity on multibyte, empty, NULL,
  * and corpus text.
  */
case class CdcStarts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_starts"

  override def nullSafeEval(a: Any): Any =
    CdcStarts.compute(a.asInstanceOf[UTF8String])

  // one static call — the loop lives in compiled Scala, the wrapper
  // keeps the surrounding stage in whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.CdcStarts.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcStarts {
  /** Boundary window (chars) and mask modulus — the declared CDC
    * parameters, shared with the SQL oracle via `Pipeline.CDC_W` /
    * `CDC_MOD` (which assert equality with these at class init).
    */
  val W = 16
  val MOD = 64

  // one digest per thread, reset per window — the SimHash64 rationale:
  // getInstance is a provider lookup + allocation and this kernel runs
  // once per corpus CHARACTER, not per row
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Interpreted kernel shared by eval and codegen. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // char-start byte offsets (UTF-8 lead bytes = codepoints, the unit
    // both engines' substr/length count)
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xc0) != 0x80) nChars += 1
      i += 1
    }
    val offs = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(nChars) = nBytes
    val out = new Array[Int](math.max(nChars - W, 0) + 1)
    var cnt = 0
    out(cnt) = 1
    cnt += 1
    if (nChars >= W + 1) {
      val md = md5.get()
      var p = 2
      val last = nChars - W + 1
      while (p <= last) {
        md.reset()
        md.update(bytes, offs(p - 1), offs(p - 1 + W) - offs(p - 1))
        val d = md.digest()
        if ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % MOD == 0) {
          out(cnt) = p
          cnt += 1
        }
        p += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }
}

object CdcFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Function descriptions for [[graft.GraftExtensions]]. */
  def injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_cdc_starts"),
        new ExpressionInfo(classOf[CdcStarts].getName, "graft_cdc_starts"),
        exprs => CdcStarts(exprs(0))))

  /** Idempotent session registration (also usable from SQL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cdc_starts", exprs => CdcStarts(exprs(0)), "built-in")

  def cdcStarts(spark: SparkSession, t: Column): Column = {
    register(spark)
    call_function("graft_cdc_starts", t)
  }
}
