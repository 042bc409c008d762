package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Preference
import graft.testkit.SparkTestKit._

/** Pairwise-preference contracts: win-matrix canonicalization, the
  * Bradley–Terry MLE on closed-form cases, planted-strength recovery,
  * bit-identical determinism, cycle detection, and the loud
  * validation surface. (q257–q259 check the event-derived tournament
  * against DuckDB; this pins the arithmetic on hand cases.) */
class PreferenceSpec extends AnyFunSuite {

  private def comps(rows: Seq[(String, String)]) =
    table("w string, l string", rows.map(t => row(t._1, t._2)))

  test("pairwiseWinMatrix: canonical pairs, counts, Wilson bounds") {
    val df = comps(Seq(("B", "A"), ("B", "A"), ("A", "B"), ("C", "A")))
    val got = Preference.pairwiseWinMatrix(df, "w", "l").collect()
    assert(got.length == 2)
    // (A, B): 3 comparisons, A won 1
    assert(got(0).getString(0) == "A" && got(0).getString(1) == "B")
    assert(got(0).getLong(2) == 3L && got(0).getLong(3) == 1L)
    assert(got(0).getDouble(4) == 0.333333)
    assert(got(0).getDouble(5) < 0.333333 && got(0).getDouble(6) > 0.333333)
    // (A, C): 1 comparison, A won 0
    assert(got(1).toSeq.take(4) == Seq("A", "C", 1L, 0L))
  }

  test("bradleyTerry: two-model closed form — rating is the win share") {
    // MM fixed point for 2 models is p_a = wins_a/(total), reached in
    // one iteration from any start
    val df = comps(Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A")))
    val got = Preference.bradleyTerry(df, "w", "l").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A", "B"))
    assert(got(0).getDouble(3) == 0.75 && got(0).getInt(4) == 1)
    assert(got(1).getDouble(3) == 0.25 && got(1).getInt(4) == 2)
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 4L)
  }

  test("bradleyTerry: planted chain recovers the order, rerun bit-identical") {
    val df = comps(
      Seq.fill(9)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(9)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
      Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A")))
    val r1 = Preference.bradleyTerry(df, "w", "l").collect()
    assert(r1.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    assert(r1(0).getDouble(3) > r1(1).getDouble(3))
    assert(r1(1).getDouble(3) > r1(2).getDouble(3))
    assert(r1.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
    val r2 = Preference.bradleyTerry(df, "w", "l").collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("bradleyTerry: winless, undefeated, self-comparison, <2 models loud") {
    val winless = comps(Seq(("A", "B"), ("B", "C"), ("A", "C")))
    val e1 = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(winless, "w", "l").collect()
    }
    assert(e1.getMessage.contains("never"))
    val self = comps(Seq(("A", "A"), ("A", "B"), ("B", "A")))
    val e2 = intercept[Exception] {
      Preference.bradleyTerry(self, "w", "l").collect()
    }
    assert(e2.getMessage.contains("self-comparison"))
    val lone = comps(Seq.empty)
    val e3 = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(lone, "w", "l").collect()
    }
    assert(e3.getMessage.contains("at least 2"))
  }

  test("intransitivityAudit: planted cycle found once, transitive set clean") {
    val cycle = comps(Seq.fill(2)(("A", "B")) ++ Seq.fill(2)(("B", "C")) ++
      Seq.fill(2)(("C", "A")))
    val got = Preference.intransitivityAudit(cycle, "w", "l").head()
    assert(got.toSeq.take(6) == Seq(3L, 3L, 3L, 0L, 1L, 1L))
    assert(got.getDouble(6) == 1.0)
    val chain = comps(Seq(("A", "B"), ("B", "C"), ("A", "C")))
    val got2 = Preference.intransitivityAudit(chain, "w", "l").head()
    assert(got2.toSeq.take(6) == Seq(3L, 3L, 3L, 0L, 1L, 0L))
    assert(got2.getDouble(6) == 0.0)
  }

  test("intransitivityAudit: tied pairs contribute no edge") {
    val df = comps(Seq(("A", "B"), ("B", "A"), ("A", "C"), ("B", "C")))
    val got = Preference.intransitivityAudit(df, "w", "l").head()
    // 3 pairs, AB tied -> 2 edges, no triple closes
    assert(got.toSeq.take(6) == Seq(3L, 3L, 2L, 1L, 0L, 0L))
    assert(got.isNullAt(6))
  }

  test("bradleyTerry: dense tournament trips the pair guard, not the model one") {
    // 30 models, full round robin both directions: 870 directed pairs
    // is well under 30^2 models-squared intuition but is the ACTUAL
    // driver cost — the guard must count pairs
    val models = (0 until 30).map(i => f"m$i%02d")
    val dense = table("w string, l string",
      for { a <- models; b <- models if a != b } yield row(a, b))
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(dense, "w", "l", maxPairs = 500L)
    }
    assert(e.getMessage.contains("870 directed win-count pairs") &&
      e.getMessage.contains("maxPairs"))
    // at the default bound the same tournament fits and ties flat
    val ok = Preference.bradleyTerry(dense, "w", "l")
    assert(ok.count() == 30L)
    val ratings = ok.collect().map(_.getDouble(3)).distinct
    assert(ratings.length == 1, "symmetric round robin rates all equal")
  }
}
