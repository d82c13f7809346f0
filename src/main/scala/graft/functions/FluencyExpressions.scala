package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-ppm corpus-conditional bigram fluency of a token array
  * against a serialized STALE probability table — the per-row kernel
  * of the streaming fluency gate (the [[BloomNoveltyPpm]] pattern
  * applied to `x_bigram_fluency`'s statistic): for each adjacent
  * token pair the table's `P(b|a)` in ppm (a bigram the base corpus
  * never saw scores 0 — the stale-stats analog of `x_bm25_incr`'s
  * df-0 rule: fresh text stays scoreable, it just carries no base
  * evidence), and the result is the integer mean `Σppm div (n-1)`.
  * Null for docs under 2 tokens (no bigrams — no signal, mirroring
  * the batch operator's NULL) AND for docs where EVERY bigram misses
  * the table: zero matched bigrams means the base corpus holds no
  * evidence about the doc at all, which is absence of signal, not
  * disfluency — the same no-evidence→NULL rule the sub-bigram case
  * already applies. Without this rule a gate over the score would
  * flat-reject the first ingest of any genuinely new language or
  * domain (the opposite selection pressure from the novelty gate it
  * sits beside); with it, partial evidence still counts in full
  * (matched-ppm sum over ALL bigrams, unseen ones diluting at 0).
  *
  * `right` must be a FOLDABLE binary column: the table serialized by
  * [[BigramFluencyPpm.serialize]] (sorted key hashes + ppm values,
  * built once per compaction by `Pipeline.corpusBigramStats`). It
  * deserializes ONCE per executor into a codegen reference object;
  * per row the generated code runs binary searches over two long
  * arrays, never touching the bytes again. Keys are seed-chained
  * XXH64 over the two tokens' UTF-8 bytes (length-ambiguity-free,
  * unlike hashing a joined string) — a collision between distinct
  * bigrams is ~n²/2⁶⁵, the same accepted budget as the minhash
  * family's shingle hashing.
  */
case class BigramFluencyPpm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), BinaryType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(StringType, _), BinaryType) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a FOLDABLE binary stats argument")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, binary), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bigram_fluency_ppm"

  @transient private lazy val table: BigramFluencyPpm.Table = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) throw new IllegalArgumentException(
      s"$prettyName: the serialized bigram stats argument is NULL")
    BigramFluencyPpm.deserialize(bytes)
  }

  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) null
    else BigramFluencyPpm.compute(arr.asInstanceOf[ArrayData], table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bigramTable", table,
      classOf[BigramFluencyPpm.Table].getName)
    val leftGen = left.genCode(ctx)
    val r = ctx.freshName("r")
    val code =
      code"""
        |${leftGen.code}
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = 0L;
        |if (!${leftGen.isNull}) {
        |  Object $r = graft.functions.BigramFluencyPpm.compute(
        |    ${leftGen.value}, $tableRef);
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

object BigramFluencyPpm {

  /** Executor-resident lookup: sorted bigram key hashes and their
    * aligned ppm values.
    */
  final class Table(val keys: Array[Long], val ppms: Array[Long])
      extends Serializable

  private def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Seed-chained bigram key: hash(b) seeded by hash(a) — free of the
    * concatenation ambiguity a joined-string hash would carry.
    */
  def key(a: UTF8String, b: UTF8String): Long = hash(b, hash(a, 42L))

  /** JVM-string overload for the driver-side builder. */
  def key(a: String, b: String): Long =
    key(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Absolute entry ceiling for the single-buffer blob layout:
    * past this, `4 + n*16` overflows Int (a negative
    * `ByteBuffer.allocate`). Builders must budget FAR below it —
    * [[graft.queries.Pipeline.BIGRAM_STATS_MAX_ENTRIES]] caps at 4M
    * entries (64 MB) — this constant only turns a silent overflow
    * into a named contract violation.
    */
  val MaxTableEntries: Int = (Int.MaxValue - 4) / 16

  /** (key, ppm) pairs → sorted binary blob: [int n][n keys][n ppms]. */
  def serialize(pairs: Array[(Long, Long)]): Array[Byte] = {
    require(pairs.length <= MaxTableEntries,
      s"bigram stats table has ${pairs.length} entries, over the " +
        s"$MaxTableEntries blob-layout ceiling; cap the build " +
        "(corpusBigramStats maxEntries) far below this")
    val sorted = pairs.sortBy(_._1)
    val bb = ByteBuffer.allocate(4 + sorted.length * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(sorted.length)
    sorted.foreach(p => bb.putLong(p._1))
    sorted.foreach(p => bb.putLong(p._2))
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Table = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val keys = Array.fill(n)(bb.getLong())
    val ppms = Array.fill(n)(bb.getLong())
    new Table(keys, ppms)
  }

  /** Interpreted kernel shared by eval and codegen: integer mean of
    * per-bigram table ppms (missing bigram → 0); null under 2 tokens,
    * on a null element, or when NO bigram matched the table (zero
    * base evidence = no signal — the class doc's novel-domain rule).
    */
  def compute(arr: ArrayData, t: Table): java.lang.Long = {
    val n = arr.numElements()
    if (n < 2) return null
    var sum = 0L
    var matched = 0
    var i = 0
    while (i < n - 1) {
      if (arr.isNullAt(i) || arr.isNullAt(i + 1)) return null
      val k = key(arr.getUTF8String(i), arr.getUTF8String(i + 1))
      val idx = java.util.Arrays.binarySearch(t.keys, k)
      if (idx >= 0) { sum += t.ppms(idx); matched += 1 }
      i += 1
    }
    if (matched == 0) null
    else java.lang.Long.valueOf(sum / (n - 1))
  }
}
