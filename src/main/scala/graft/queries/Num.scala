package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * the oracle SQL. Double aggregation is order-dependent, so every
  * money/measure aggregate goes through exact decimal arithmetic:
  * source doubles carry ≤2 decimal digits (verified on the testdata),
  * so `CAST(x AS DECIMAL(18,4))` is lossless and identical in both
  * engines, decimal sums are exact and order-independent, and the final
  * `CAST(... AS DOUBLE)` is deterministic. This also keeps aggregation
  * deterministic at 100 TB, where partial-aggregate ordering across
  * thousands of tasks is arbitrary.
  */
object Num {
  /** Lossless fixed-point view of a ≤4-decimal double column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent exact sum of a ≤4-decimal double column,
    * returned as double. Oracle: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE).
    */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact decimal mean returned as double (sum exact, division in
    * double is deterministic given identical operands).
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*).
    */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))
}
