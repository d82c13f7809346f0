package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Blanket physical-plan invariants swept over the ENTIRE registry —
  * the failure modes that are catastrophic at 100 TB but invisible in
  * a green sf0.01 hash-compare. Per-query shape pins live in
  * [[PlanSpec]]; this sweep guarantees no NEW operator can ship with
  * one of the known-fatal shapes.
  */
class PlanSweepSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val plans: Map[String, String] =
    graft.SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).queryExecution.executedPlan.toString
    }

  test("no query plans a CartesianProduct") {
    // every deliberate cross join in the repo is a broadcast
    // nested-loop over index metadata (cells × 1 centroids, 1-row
    // query vectors); a CartesianProduct is always a lost broadcast —
    // at 100 TB that is corpus × corpus
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"CartesianProduct in: ${offenders.mkString(", ")}")
  }

  // Deliberately NOT swept: global Sort. Every oracle-checked query
  // ends in its declared presentation ORDER BY (the hash-compare
  // needs a total order), so "has a global sort" is true of per-row
  // report queries by construction — a 100 TB consumer drops the
  // final ORDER BY and everything upstream of it is what the
  // per-query PlanSpec pins (pushdown, pruning, broadcast choice,
  // map-side limits).
}
