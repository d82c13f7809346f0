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

  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's
    * vectorized reader rejects. Read it as a raw long
    * (`spark.sql.legacy.parquet.nanosAsLong`, a session-wide conf that
    * has no per-read option — [[Sessions.builder]] sets it at session
    * construction, never mid-query) and floor-divide to µs — integer
    * `div`, not `/`, because 2024-epoch nanos exceed 2^53 and would
    * lose precision through a double. The µs value matches DuckDB's
    * native ns timestamp at every granularity ≥ 1 µs.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true " +
        "(use graft.Sessions.builder) to read events.ts TIMESTAMP(NANOS)")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
