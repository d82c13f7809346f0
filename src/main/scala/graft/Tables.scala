package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file at `{sfDir}/{name}.parquet`. At
  * 100 TB scale the same call reads a partitioned directory — nothing
  * here assumes single-file inputs: `spark.read.parquet` takes files or
  * directories interchangeably, and every downstream query relies on
  * Catalyst for predicate pushdown + column pruning rather than
  * pre-slicing data here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped as both TIMESTAMP(MICROS) and
    * TIMESTAMP(NANOS) across fixture generations, so the loader keys
    * on what the footer actually declares instead of assuming either.
    * Micros (or millis) is Spark-native: plain inference reads it as
    * `TimestampType` and the unit conversion is the reader's job.
    * Nanos is the special case — Spark's schema inference rejects it,
    * but an EXPLICIT user schema typing `ts` as long reads the raw
    * nanos fine (verified against the bundled Spark 4.1 vectorized
    * reader) — no session conf needed, so this works identically in
    * any caller's session with zero global state. Floor-divide to µs
    * with integer `div`, not `/`, because 2024-epoch nanos exceed
    * 2^53 and would lose precision through a double. The µs value
    * matches DuckDB's native ns timestamp at every granularity ≥ 1 µs
    * (the fixtures carry no sub-µs parts).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val path = s"$sfDir/events.parquet"
    def schemaWithTs(ts: DataType): StructType = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", ts),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def nanosFallback: DataFrame =
      spark.read.schema(schemaWithTs(LongType)).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // the catch covers ONLY the ns-logical-type inference rejection
    // (verified: AnalysisException [PARQUET_TYPE_ILLEGAL] "Illegal
    // Parquet type: INT64 (TIMESTAMP(NANOS,...))"); anything else —
    // corrupt footer, FS failure — must surface, not silently reroute
    // into the raw-nanos reinterpretation. Type dispatch likewise
    // happens outside the catch so a missing/unexpected ts column
    // fails loudly instead of riding the fallback into nulls.
    val inferredDf =
      try Some(spark.read.parquet(path))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Illegal Parquet type") ||
              e.getMessage.contains("PARQUET_TYPE_ILLEGAL") => None
      }
    inferredDf match {
      case None => nanosFallback
      case Some(df) =>
        df.schema("ts").dataType match { // throws if ts is absent — intended
          case TimestampType => df
          // pyarrow writes tz-naive micros → isAdjustedToUTC=false →
          // Spark infers NTZ. A NTZ→Timestamp CAST would reinterpret
          // the naive value in the SESSION timezone (an instant shift
          // anywhere but UTC); re-reading with an explicit
          // TimestampType schema loads the stored micros directly, so
          // the loader honors its works-in-any-caller's-session
          // contract with zero session conf
          case TimestampNTZType =>
            spark.read.schema(schemaWithTs(TimestampType)).parquet(path)
          // plain int64 with no logical annotation: raw nanos
          case LongType => nanosFallback
          case other => throw new IllegalArgumentException(
            s"events.ts has unsupported type ${other.catalogString} — " +
              "expected a timestamp (any unit) or raw int64 nanos")
        }
    }
  }
}
