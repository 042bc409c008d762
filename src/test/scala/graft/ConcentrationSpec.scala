package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Profile, Stats}
import graft.testkit.SparkTestKit._

/** HHI / Theil concentration contracts: closed-form cases (uniform,
  * single-holder, dominant), the counts-path and fold equivalences,
  * the per-group twin, and the loud mass guards. (q260–q265 check the
  * token-mass corpus against DuckDB; this pins the arithmetic.) */
class ConcentrationSpec extends AnyFunSuite {

  private def masses(xs: Seq[Long]) =
    table("g string, x bigint",
      xs.zipWithIndex.map { case (x, i) => row(s"g${i % 2}", x) })

  test("hhiIndex: uniform, dominant, single-holder closed forms") {
    val uniform = masses(Seq(5L, 5L, 5L, 5L))
    val u = Stats.hhiIndex(uniform, "x").head()
    assert(u.toSeq == Seq(4L, 20L, 0.25, 0.0))
    val dominant = masses(Seq(9L, 1L))
    val d = Stats.hhiIndex(dominant, "x").head()
    assert(d.toSeq == Seq(2L, 10L, 0.82, 0.64))
    val single = masses(Seq(7L))
    val s = Stats.hhiIndex(single, "x").head()
    assert(s.getDouble(2) == 1.0 && s.isNullAt(3))
  }

  test("hhiFromCounts == hhiIndex, and the fold preserves it") {
    val df = masses(Seq(3L, 3L, 9L, 1L, 0L, 7L))
    val direct = Stats.hhiIndex(df, "x").head().toSeq
    val counts = Profile.ksSideCounts(df, "x", "cnt")
    assert(Stats.hhiFromCounts(counts).head().toSeq == direct)
    val a = Profile.ksSideCounts(df.filter(col("g") === "g0"), "x", "cnt")
    val b = Profile.ksSideCounts(df.filter(col("g") === "g1"), "x", "cnt")
    assert(Stats.hhiFromCounts(Profile.foldValueCounts(a, b))
      .head().toSeq == direct)
  }

  test("hhiIndexByGroup == filtered ungrouped; zero-mass group NULL") {
    val df = masses(Seq(3L, 3L, 9L, 1L, 2L, 7L))
    val grouped = Stats.hhiIndexByGroup(df, "g", "x").collect()
    Seq("g0", "g1").zipWithIndex.foreach { case (g, i) =>
      val solo = Stats.hhiIndex(df.filter(col("g") === g), "x").head()
      assert(grouped(i).toSeq.drop(1) == solo.toSeq, g)
      assert(grouped(i).getString(0) == g)
    }
    val zeroes = table("g string, x bigint",
      Seq(row("z", 0L), row("z", 0L), row("w", 4L)))
    val gz = Stats.hhiIndexByGroup(zeroes, "g", "x").collect()
    assert(gz(0).getString(0) == "w" && gz(0).getDouble(3) == 1.0)
    assert(gz(1).getString(0) == "z" && gz(1).isNullAt(3) &&
      gz(1).isNullAt(4))
  }

  test("theilIndex: uniform 0, one-holder-of-n is ln(n) with norm 1, zeros count") {
    val uniform = masses(Seq(5L, 5L, 5L, 5L))
    val u = Stats.theilIndex(uniform, "x").head()
    assert(u.toSeq == Seq(4L, 20L, 0.0, 0.0))
    // masses (1, 0): n=2, all mass on one holder -> T = ln(2), norm 1
    val solo = masses(Seq(1L, 0L))
    val s = Stats.theilIndex(solo, "x").head()
    assert(s.getLong(0) == 2L && s.getLong(1) == 1L)
    assert(s.getDouble(2) == 0.693147 && s.getDouble(3) == 1.0)
    val one = masses(Seq(42L))
    val o = Stats.theilIndex(one, "x").head()
    assert(o.getDouble(2) == 0.0 && o.isNullAt(3))
  }

  test("theilIndexByGroup == filtered ungrouped; zero-mass group NULL") {
    val df = masses(Seq(3L, 3L, 9L, 1L, 2L, 7L))
    val grouped = Stats.theilIndexByGroup(df, "g", "x").collect()
    Seq("g0", "g1").zipWithIndex.foreach { case (g, i) =>
      val solo = Stats.theilIndex(df.filter(col("g") === g), "x").head()
      assert(grouped(i).toSeq.drop(1) == solo.toSeq, g)
    }
    val zeroes = table("g string, x bigint",
      Seq(row("z", 0L), row("z", 0L), row("w", 4L)))
    val gz = Stats.theilIndexByGroup(zeroes, "g", "x").collect()
    assert(gz(1).getString(0) == "z" && gz(1).isNullAt(3) &&
      gz(1).isNullAt(4))
  }

  test("theilFromCounts == theilIndex, and the fold preserves it") {
    val df = masses(Seq(3L, 3L, 9L, 1L, 0L, 7L, 100L, 2L))
    val direct = Stats.theilIndex(df, "x").head().toSeq
    val counts = Profile.ksSideCounts(df, "x", "cnt")
    assert(Stats.theilFromCounts(counts).head().toSeq == direct)
    val a = Profile.ksSideCounts(df.filter(col("g") === "g0"), "x", "cnt")
    val b = Profile.ksSideCounts(df.filter(col("g") === "g1"), "x", "cnt")
    assert(Stats.theilFromCounts(Profile.foldValueCounts(a, b))
      .head().toSeq == direct)
  }

  test("theilDecomposition: between + within recovers the total") {
    val df = masses(Seq(30L, 1L, 9L, 1L, 2L, 70L, 5L, 5L))
    val d = Stats.theilDecomposition(df, "g", "x").head()
    val total = Stats.theilIndex(df, "x").head()
    assert(d.getLong(0) == total.getLong(0))
    assert(d.getLong(2) == total.getLong(1))
    assert(d.getDouble(3) == total.getDouble(2), "total replays theilIndex")
    // the identity is exact in real arithmetic; the three emitted
    // numbers each carry one rounding layer
    assert(math.abs(d.getDouble(3) - (d.getDouble(4) + d.getDouble(5)))
      < 1e-5, d.toSeq.toString)
    // one group per holder: within 0, between = total
    val solo = table("g string, x bigint",
      Seq(row("a", 9L), row("b", 1L), row("c", 4L)))
    val ds = Stats.theilDecomposition(solo, "g", "x").head()
    assert(ds.getDouble(5) == 0.0)
    assert(ds.getDouble(4) == ds.getDouble(3))
  }

  test("per-group counts paths == direct per-group, and folds preserve them") {
    val df = masses(Seq(3L, 3L, 9L, 1L, 2L, 7L, 0L, 100L))
    val gc = Profile.groupSideCounts(df, "g", "x")
    assert(Stats.hhiByGroupFromCounts(gc, "g").collect().map(_.toSeq).toSeq ==
      Stats.hhiIndexByGroup(df, "g", "x").collect().map(_.toSeq).toSeq)
    assert(Stats.theilByGroupFromCounts(gc, "g").collect().map(_.toSeq).toSeq ==
      Stats.theilIndexByGroup(df, "g", "x").collect().map(_.toSeq).toSeq)
    val a = Profile.groupSideCounts(df.filter(col("x") < 5L), "g", "x")
    val b = Profile.groupSideCounts(df.filter(col("x") >= 5L), "g", "x")
    val folded = Profile.foldGroupValueCounts(a, b)
    assert(Stats.hhiByGroupFromCounts(folded, "g").collect().map(_.toSeq).toSeq ==
      Stats.hhiIndexByGroup(df, "g", "x").collect().map(_.toSeq).toSeq)
    assert(Stats.theilByGroupFromCounts(folded, "g").collect().map(_.toSeq).toSeq ==
      Stats.theilIndexByGroup(df, "g", "x").collect().map(_.toSeq).toSeq)
  }

  test("NULL group is its own stratum in every per-group reader") {
    val df = table("g string, x bigint",
      Seq(row("a", 3L), row("a", 9L), row(null, 4L), row(null, 2L)))
    val tg = Stats.theilIndexByGroup(df, "g", "x").collect()
    assert(tg.length == 2 && tg.exists(_.isNullAt(0)),
      tg.map(_.toSeq).mkString("; "))
    val hg = Stats.hhiIndexByGroup(df, "g", "x").collect()
    assert(hg.length == 2 && hg.exists(_.isNullAt(0)))
    // the NULL group's within term stays in the decomposition, so the
    // identity still holds
    val d = Stats.theilDecomposition(df, "g", "x").head()
    assert(d.getLong(1) == 2L, "two groups incl. the NULL stratum")
    assert(math.abs(d.getDouble(3) - (d.getDouble(4) + d.getDouble(5)))
      < 1e-5, d.toSeq.toString)
  }

  test("loud guards: negative, fractional, and zero-total masses") {
    val neg = masses(Seq(3L, -1L))
    val e1 = intercept[Exception] {
      Stats.hhiIndex(neg, "x").head()
    }
    assert(e1.getMessage.contains("non-negative"))
    val frac = table("g string, x double", Seq(row("a", 2.5)))
    val e2 = intercept[Exception] {
      Stats.theilIndex(frac, "x").head()
    }
    assert(e2.getMessage.contains("non-negative integer"))
    val zeros = masses(Seq(0L, 0L))
    val e3 = intercept[IllegalArgumentException] {
      Stats.hhiIndex(zeros, "x").head()
    }
    assert(e3.getMessage.contains("total mass is zero"))
    val e4 = intercept[IllegalArgumentException] {
      Stats.theilIndex(zeros, "x").head()
    }
    assert(e4.getMessage.contains("total mass is zero"))
  }
}
