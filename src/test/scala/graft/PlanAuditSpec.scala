package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan invariants over EVERY SparkEntry query — the
  * automated form of the per-operator `.explain` audits: anti-patterns
  * that would sink a 100 TB run must not (re)appear anywhere in the
  * query surface, regardless of which operator a future change touches.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, Sf0001).queryExecution.executedPlan.toString
    }

  test("no query plans a CartesianProduct") {
    // unbroadcast cross joins are O(n²) shuffle disasters at scale; the
    // intentional cross joins (ANN corpus × bounded centroids/queries,
    // scalar-count attach) must all plan as BroadcastNestedLoopJoin with
    // the bounded side broadcast
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  /** Queries whose plans legitimately contain a single-partition
    * exchange: every one feeds it from bounded data — a final global
    * aggregate of already-combined partials (scalar report rows), a
    * ≤k-row limited frame, or a fixed-size suite/result frame. A
    * single-partition exchange over UNBOUNDED data (the
    * customer_value_ranks defect fixed in round 3) must not come back.
    */
  private val boundedSinglePartition = Set(
    "approx_sketches",      // one global sketch row
    "ce_run_report",        // one report row
    "dedup_exact",          // one summary row
    "dedup_survivors",      // one summary row
    "dq_dimension_scores",  // ≤5 dimension rows from a 15-row frame
    "dq_docs_suite",        // fixed 8-expectation frame
    "dq_suite_results",     // fixed 15-expectation frame
    "dq_suite_summary",     // one summary row
    "dq_trend_daily",       // one trend row
    "set_ops_users",        // one flags row
    "customer_value_ranks", // window over the ≤50-row top-k merge
    "schema_drift_report",  // O(distinct keys) report + scalar count
    "dq_alias_suite",       // fixed 15-expectation frame (aliased twin)
    "agent_daily_decisions")// streak windows over the O(days) aggregate

  test("single-partition exchanges only over bounded data") {
    val offenders = plans.collect {
      case (n, p) if p.contains("SinglePartition")
        && !boundedSinglePartition(n) => n
    }
    assert(offenders.isEmpty,
      s"unexpected single-partition exchanges in: $offenders")
  }

  test("broadcast joins carry the bounded dimension sides") {
    // the headline fact⋈dims rollups must broadcast, not shuffle, dims
    assert(plans("revenue_by_region").contains("BroadcastHashJoin"))
    assert(plans("q5_local_supplier").contains("BroadcastHashJoin"))
    // simhash signatures are a map-side projection (native simhash_sig):
    // the only exchanges in the near-dup plan are the key self-join's,
    // never a per-bit aggregate over exploded grams
    assert(plans("dedup_simhash").contains("simhash_sig"))
    assert(!plans("dedup_simhash").contains("posexplode"))
  }
}
