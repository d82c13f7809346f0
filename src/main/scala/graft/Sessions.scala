package graft

import org.apache.spark.sql.SparkSession

/** One place that builds graft sessions, so every entry point (Verify,
  * Bench, tests) runs with identical session-scoped semantics:
  *
  *  - UTC session timezone (oracle comparisons are timezone-free),
  *  - `nanosAsLong` set HERE, once, at build time — never flipped
  *    mid-query as a side effect of reading a table (events.ts is
  *    TIMESTAMP(NANOS), which the vectorized reader otherwise rejects
  *    and which has no per-read option),
  *  - shuffle partitions sized to the local core count (the 100 TB
  *    deployment overrides via normal Spark conf; nothing in the query
  *    code assumes a partition count).
  */
object Sessions {
  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String, cpus: String = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
