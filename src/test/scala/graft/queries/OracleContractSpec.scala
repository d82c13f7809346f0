package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The registry contract the driver's correctness gate depends on —
  * checked without a SparkSession, so a wiring mistake fails in
  * milliseconds, not at the end of a Verify run.
  */
class OracleContractSpec extends AnyFunSuite {

  test("queries and oracle SQL registries align one-to-one") {
    // as of round 6 there are no rows-only ops left (x_token_sketch
    // got an engine-agnostic oracle); if one ever returns, add an
    // explicit exemption set here rather than weakening the check
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without a query: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${q -- o}")
  }

  test("no oracle SQL carries a scrambled-initialization artifact") {
    // the SQL vals form a dependency chain across the file; a strict
    // val forcing a lazy one before its own dependencies initialize
    // interpolates the string "null" into the CTE text and DuckDB
    // fails with an opaque parser error five stages later (it
    // happened: filterFunnelSql forced the dedupFull chain ahead of
    // embedNearDupSql). The artifact has a specific shape — every SQL
    // interpolation in Pipeline is either parenthesized (`ep AS
    // ($embedNearDupSql)` → `ep AS (null)`) or a bare CTE chunk on
    // its own line (`$lexEdgeCtesSql,` → `null,`) — so match THOSE,
    // not every lowercase "null" (a future oracle may legitimately
    // carry one inside a JSON or string literal).
    val artifact = java.util.regex.Pattern.compile(
      "\\(null\\)|(?m)^\\s*null,?\\s*$|WITH null\\b|, null,")
    graft.SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!artifact.matcher(sql).find(),
        s"$name oracle contains an uninitialized-val interpolation artifact")
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
    }
  }
}
