package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Exact-ppm novelty of a shingle array against a serialized Bloom
  * filter of the corpus shingle universe: `floor(1e6 · |shingles not
  * in filter| / |shingles|)`, null for an empty array (no shingles —
  * no signal, mirroring the batch novelty stage's exemption).
  *
  * `right` must be a FOLDABLE binary column (the serialized
  * [[org.apache.spark.util.sketch.BloomFilter]], built once per
  * corpus by `Pipeline.corpusShingleFilter` via the public
  * `df.stat.bloomFilter`); the filter deserializes ONCE per executor
  * into a codegen reference object — per row the generated code runs
  * one tight membership loop, never touching the bytes again. Why a
  * native expression: Spark's own bloom machinery
  * (`bloom_filter_agg`/`might_contain`) is internal-only, and an
  * `exists()` higher-order function over a might-contain UDF would
  * run interpreted per element in the hot ingest path.
  *
  * Membership semantics match `stat.bloomFilter` on a string column
  * (UTF-8 bytes through `putString`/`mightContainBinary` — asserted
  * against the batch anti-join in StreamingSpec). Bloom false
  * positives make a shingle look "already seen", so the reported
  * novelty is a slight UNDER-estimate at the configured fpp — the
  * conservative direction for a drop-if-below-floor gate (it never
  * inflates a rehash into looking novel).
  */
case class BloomNoveltyPpm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), BinaryType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(StringType, _), BinaryType) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a FOLDABLE binary filter argument")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, binary), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = LongType
  // null on an empty array even for non-nullable input — see MicroVec
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_novelty_ppm"

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    // a foldable NULL binary (lit(null).cast("binary")) passes the
    // type check but has no filter to deserialize — fail with the
    // expression's name instead of an opaque NPE at codegen reference
    // time
    if (bytes == null) throw new IllegalArgumentException(
      s"$prettyName: the serialized Bloom filter argument is NULL")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) null
    else BloomNoveltyPpm.compute(arr.asInstanceOf[ArrayData], filter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val filterRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    val leftGen = left.genCode(ctx)
    val r = ctx.freshName("r")
    val code =
      code"""
        |${leftGen.code}
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = 0L;
        |if (!${leftGen.isNull}) {
        |  Object $r = graft.functions.BloomNoveltyPpm.compute(
        |    ${leftGen.value}, $filterRef);
        |  if ($r != null) {
        |    ${ev.isNull} = false;
        |    ${ev.value} = ((java.lang.Long) $r).longValue();
        |  }
        |}
      """.stripMargin
    ev.copy(code = code, isNull =
      if (nullable) ev.isNull else FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomNoveltyPpm {
  /** Interpreted kernel shared by eval and codegen: novelty ppm via
    * integer floor division; null for empty arrays or a null element.
    */
  def compute(arr: ArrayData, f: BloomFilter): java.lang.Long = {
    val n = arr.numElements()
    if (n == 0) return null
    var novel = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      if (!f.mightContainBinary(arr.getUTF8String(i).getBytes)) novel += 1L
      i += 1
    }
    java.lang.Long.valueOf(novel * 1000000L / n)
  }
}
