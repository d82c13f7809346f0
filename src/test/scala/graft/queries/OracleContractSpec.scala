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
    // embedNearDupSql). Scala's null renders lowercase and the
    // oracles write NULL uppercase, so lowercase-null is the artifact.
    graft.SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.matches("(?s).*\\bnull\\b.*"),
        s"$name oracle contains a lowercase 'null' — uninitialized val interpolated")
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
    }
  }
}
