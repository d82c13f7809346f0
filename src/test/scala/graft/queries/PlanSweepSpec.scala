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

  private lazy val sparkPlans: Map[String, org.apache.spark.sql.execution.SparkPlan] =
    graft.SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).queryExecution.executedPlan
    }

  private lazy val plans: Map[String, String] =
    sparkPlans.map { case (name, p) => name -> p.toString }

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

  test("every partition-less window sits above a bounded (aggregated/limited) input") {
    // a Window with no PARTITION BY executes in ONE task — correct
    // only when its input is already bounded (an aggregate over a
    // small key domain, a top-k limit, a literal table). Each known
    // site in the registry is deliberate (≤10 deciles, ≤100-row
    // fusion pools, ≤5 stages, the scan-tree's super-bucket level);
    // this sweep makes the boundedness STRUCTURAL, so a new
    // partition-less window over corpus-sized input fails tests
    // instead of emitting the WindowExec WARN that masks real
    // offenders
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec

    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.initialPlan)
      case other =>
        other +: (other.children ++ other.subqueries).flatMap(expand)
    }
    // node classes whose output is bounded regardless of corpus size
    val bounded = Set("HashAggregateExec", "ObjectHashAggregateExec",
      "SortAggregateExec", "TakeOrderedAndProjectExec", "GlobalLimitExec",
      "LocalLimitExec", "CollectLimitExec", "LocalTableScanExec",
      "WindowGroupLimitExec")
    val partitionless = sparkPlans.toSeq.sortBy(_._1).flatMap { case (name, plan) =>
      expand(plan)
        .collect { case w: WindowExec if w.partitionSpec.isEmpty => (name, w) }
    }
    // vacuity guard: the registry is KNOWN to carry partition-less
    // bounded windows (fusion-pool ranks, decile cumulations, the
    // scan-tree super-bucket level) — finding none means the
    // traversal broke (an AQE wrapper change), not that the repo went
    // window-free
    assert(partitionless.nonEmpty,
      "sweep traversal found no partition-less windows at all — " +
        "plan traversal is broken")
    val offenders = partitionless
      .filterNot { case (_, w) => expand(w.child).exists(n =>
        bounded.contains(n.getClass.getSimpleName)) }
      .map { case (name, w) =>
        s"$name [${w.windowExpression.mkString(", ").take(100)}]" }
    assert(offenders.isEmpty,
      "partition-less window over unbounded input in:\n" +
        offenders.mkString("\n"))
  }

  // Deliberately NOT swept: global Sort. Every oracle-checked query
  // ends in its declared presentation ORDER BY (the hash-compare
  // needs a total order), so "has a global sort" is true of per-row
  // report queries by construction — a 100 TB consumer drops the
  // final ORDER BY and everything upstream of it is what the
  // per-query PlanSpec pins (pushdown, pruning, broadcast choice,
  // map-side limits).
}
