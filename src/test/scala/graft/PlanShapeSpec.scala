package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestKit._

/** Plan-shape regression gate over EVERY registered query: the shapes
  * the round verdicts have audited by hand, promoted to assertions so
  * a future change cannot silently reintroduce a scale-killer.
  *
  * - No CartesianProduct / BroadcastNestedLoopJoin anywhere: every
  *   range/similarity predicate must stay bucketed into an equi-join
  *   (a nested-loop join is O(n*m) at 100 TB — the single worst plan
  *   regression possible).
  * - The dimension joins that SHOULD broadcast (q26 star schema, q37
  *   dimension chain) actually do.
  *
  * Queries are PLANNED at sf0.001 (the physical plan shape is SF-
  * independent for these queries; AQE may later rewrite sort-merge
  * joins to broadcast at runtime, but it never introduces a nested
  * loop that the static plan lacks). The streaming replay queries run
  * their stream during construction and return a plain parquet-scan
  * aggregate — they participate like any other query.
  *
  * COVERAGE BOUNDARY: the registry audit below inspects each query's
  * RETURNED frame. Operators that evaluate eagerly inside and return a
  * literal frame (the association family's grid, the Gini scalar
  * aggregate, every `Seq(...).toDF` readout) have internal plans this
  * audit never sees — those internals are pinned DIRECTLY by the
  * "eager operator internals" test at the bottom, via the operators'
  * private[graft] plan hooks. The drift family's scalar readouts
  * (ksFromCounts, wassersteinFromCounts, cvmFromCounts,
  * mannWhitneyFromCounts, jsDivergenceFromCounts, hellingerFromCounts,
  * bivariateFromMoments) sit in the same literal-readout class but
  * need no dedicated hook: their internals are grid-bounded equi-joins
  * (full-outer count merges) plus the RDD-level prefix/lag machinery
  * (withRunningTotal / withPrevValue), which structurally cannot plan
  * a window or a nested loop — there is nothing for this audit to
  * catch that the construction does not already exclude.
  */
class PlanShapeSpec extends AnyFunSuite {

  private val dataDir = "/root/testdata/sf0.001"

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dataDir).queryExecution.executedPlan.toString
    }

  test("no query plans a cartesian product or nested-loop join") {
    val offenders = plans.collect {
      case (name, plan)
          if plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin") =>
        name
    }
    assert(offenders.isEmpty,
      s"nested-loop/cartesian plans in: ${offenders.toSeq.sorted.mkString(", ")}")
  }

  test("dimension joins broadcast: q26 star schema, q37 dimension chain") {
    assert(plans("q26_star_join").contains("BroadcastHashJoin"),
      plans("q26_star_join").take(2000))
    assert(plans("q37_supplier_region").contains("BroadcastHashJoin"),
      plans("q37_supplier_region").take(2000))
  }

  test("no query collapses the corpus into a single-partition global sort window") {
    // Window.partitionBy() over a RAW table is the one window hazard;
    // the only whole-frame window in the suite (q04) runs over an
    // already-reduced 6-row frame. Detector is STRUCTURAL: flag only
    // an `Exchange SinglePartition` within the few plan lines directly
    // below a `Window` node (its required child distribution) — a
    // SinglePartition elsewhere in the plan is some bounded scalar
    // exchange (e.g. Spark's injected runtime bloom-filter subquery, a
    // k-row top-k, a literal aggregate) and not a window collapsing
    // the corpus. The old contains-both-anywhere proxy false-positived
    // exactly there (q109's anti joins attract bloom subqueries).
    def hasSinglePartitionWindow(plan: String): Boolean = {
      val lines = plan.linesIterator.toVector
      lines.zipWithIndex.exists { case (l, i) =>
        l.contains("Window ") &&
          lines.slice(i + 1, i + 5).exists(_.contains("Exchange SinglePartition"))
      }
    }
    val offenders = plans.collect {
      case (name, plan)
          if name != "q04_window_sum" && hasSinglePartitionWindow(plan) =>
        name
    }
    assert(offenders.isEmpty,
      s"single-partition window plans in: ${offenders.toSeq.sorted.mkString(", ")}")
    // the detector itself still sees q04's legitimate reduced-frame
    // global window (guards against the matcher rotting silently)
    assert(hasSinglePartitionWindow(plans("q04_window_sum")),
      "detector no longer recognizes q04's known single-partition window")
  }

  test("eager operator internals stay bounded: association grid, gini rank aggregate") {
    import graft.operators.{Profile, Stats}
    import graft.testkit.SparkTestKit.{row, table}
    // the association grid's one nested-loop join must sit BETWEEN the
    // two cells-bounded marginal aggregates — never against the joint
    // fact input directly (the cells-bounded-by-construction claim)
    val joint = table("__a string, __b string, __c bigint", Seq(
      row("x", "p", 3L), row("x", "q", 2L), row("y", "p", 5L)))
    val gridPlan = Profile.associationGrid(joint, 10L)
      .queryExecution.executedPlan.toString
    val nestedLoops = gridPlan.linesIterator.count(l =>
      l.contains("CartesianProduct") || l.contains("BroadcastNestedLoopJoin"))
    assert(nestedLoops == 1, s"expected exactly one bounded cross join:\n" +
      gridPlan.take(2000))
    val aggregates = gridPlan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggregates >= 4, // two marginal aggs, partial + final each
      s"cross join inputs are not marginal aggregates:\n${gridPlan.take(2000)}")
    // the gini scalar aggregate: ranks already rode the range-
    // partitioned contiguous-id sort, so the readout plan must contain
    // no Window and no nested-loop join at all
    val masses = table("id bigint, x bigint",
      (1L to 50L).map(i => row(i, i % 7)))
    val ranked = Stats.giniRankedMasses(masses, "x", "id")
    val aggPlan = Stats.giniSumsPlan(ranked)
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Window ") &&
      !aggPlan.contains("CartesianProduct") &&
      !aggPlan.contains("BroadcastNestedLoopJoin"), aggPlan.take(2000))
    // the hooks stay executable, not plan-only shells
    assert(Stats.giniSumsPlan(ranked).head().getLong(0) == 50L)
    graft.operators.Blocks.release(ranked)
  }
}
