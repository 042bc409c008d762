package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Moments
import graft.testkit.SparkTestKit._

/** Pearson/OLS moment-state contracts: hand-computed closed forms,
  * the fold==batch equivalence the maintenance matrix rests on,
  * degenerate-axis NULLs, and the loud validation surface.
  * (q305–q310 check the documents corpus against DuckDB; this pins
  * the arithmetic.) */
class MomentsSpec extends AnyFunSuite {

  test("pearsonOls: exact line, hand case, anti-correlation") {
    // y = 2x + 1 over x = 1..5: r = 1, slope = 2, intercept = 1
    val line = table("x bigint, y bigint",
      (1L to 5L).map(i => row(i, 2 * i + 1)))
    assert(Moments.pearsonOls(line, "x", "y").head().toSeq ==
      Seq(5L, 3.0, 7.0, 1.0, 2.0, 1.0))
    // hand case x=(1,2,3), y=(2,1,4): covN=6, varXN=6, varYN=14
    // r = 6/sqrt(84) = 0.654654, slope = 1, intercept = 1/3
    val hand = table("x bigint, y bigint",
      Seq(row(1L, 2L), row(2L, 1L), row(3L, 4L)))
    assert(Moments.pearsonOls(hand, "x", "y").head().toSeq ==
      Seq(3L, 2.0, 2.333333, 0.654654, 1.0, 0.333333))
    val anti = table("x bigint, y bigint",
      (1L to 4L).map(i => row(i, -i)))
    assert(Moments.pearsonOls(anti, "x", "y").head().getDouble(3) == -1.0)
  }

  test("pearsonOls: degenerate axes NULL, null rows excluded, loud guards") {
    // constant y: r NULL (0/0), slope exactly 0, intercept = mean y
    val flat = table("x bigint, y bigint",
      (1L to 4L).map(i => row(i, 7L)))
    val f = Moments.pearsonOls(flat, "x", "y").head()
    assert(f.isNullAt(3) && f.getDouble(4) == 0.0 && f.getDouble(5) == 7.0)
    // constant x: varXN = 0 -> r, slope, intercept all NULL
    val vert = table("x bigint, y bigint",
      Seq(row(3L, 1L), row(3L, 2L), row(3L, 5L)))
    val v = Moments.pearsonOls(vert, "x", "y").head()
    assert(v.isNullAt(3) && v.isNullAt(4) && v.isNullAt(5))
    // rows with a NULL on either axis carry no moment
    val holes = table("x bigint, y bigint",
      Seq(row(1L, 3L), row(2L, 5L), row(null, 9L), row(4L, null)))
    assert(Moments.pearsonOls(holes, "x", "y").head().getLong(0) == 2L)
    val e1 = intercept[IllegalArgumentException] {
      Moments.pearsonOls(table("x bigint, y bigint", Seq(row(1L, 1L))),
        "x", "y").head()
    }
    assert(e1.getMessage.contains(">= 2 complete"))
    val e2 = intercept[IllegalArgumentException] {
      Moments.pearsonOls(holes, "x", "x")
    }
    assert(e2.getMessage.contains("distinct columns"))
    val e3 = intercept[IllegalArgumentException] {
      Moments.pearsonOls(
        table("x string, y bigint", Seq(row("a", 1L))), "x", "y")
    }
    assert(e3.getMessage.contains("must be numeric"))
  }

  test("foldMomentState: shard fold == batch state, readouts identical") {
    val full = table("x bigint, y bigint",
      Seq(row(1L, 2L), row(2L, 1L), row(3L, 4L), row(5L, 9L), row(8L, 2L)))
    val even = full.filter(pmod(col("x"), lit(2L)) === 0L)
    val odd = full.filter(pmod(col("x"), lit(2L)) === 1L)
    val folded = Moments.foldMomentState(
      Moments.momentState(even, "x", "y"),
      Moments.momentState(odd, "x", "y"))
    assertDfEquality(folded, Moments.momentState(full, "x", "y"))
    assertDfEquality(Moments.bivariateFromMoments(folded),
      Moments.pearsonOls(full, "x", "y"))
  }

  test("weightedPearsonOls: weight-1 == unweighted, replication, loud weights") {
    val df = table("x bigint, y bigint, w bigint", Seq(
      row(1L, 2L, 1L), row(2L, 1L, 1L), row(3L, 4L, 1L)))
    assertDfEquality(Moments.weightedPearsonOls(df, "x", "y", "w"),
      Moments.pearsonOls(df, "x", "y"))
    // w = 2 is exactly the row twice; zero/NULL weights carry no mass
    val weighted = table("x bigint, y bigint, w bigint", Seq(
      row(1L, 2L, 2L), row(2L, 1L, 1L), row(3L, 4L, 0L), row(5L, 5L, null)))
    val replicated = table("x bigint, y bigint", Seq(
      row(1L, 2L), row(1L, 2L), row(2L, 1L)))
    assertDfEquality(Moments.weightedPearsonOls(weighted, "x", "y", "w"),
      Moments.pearsonOls(replicated, "x", "y"))
    val frac = table("x bigint, y bigint, w double",
      Seq(row(1L, 1L, 2.7), row(2L, 2L, 1.0)))
    val e1 = intercept[Exception] {
      Moments.weightedPearsonOls(frac, "x", "y", "w").head()
    }
    assert(e1.getMessage.contains("non-negative integer"))
    val neg = table("x bigint, y bigint, w bigint",
      Seq(row(1L, 1L, -1L), row(2L, 2L, 1L)))
    val e2 = intercept[Exception] {
      Moments.weightedPearsonOls(neg, "x", "y", "w").head()
    }
    assert(e2.getMessage.contains("negative weight"))
  }

  test("correlationMatrix: one-pass pairs, pairwise-complete, degenerate NULL") {
    val df = table("a bigint, b bigint, c bigint, k bigint", Seq(
      row(1L, 2L, -1L, 5L), row(2L, 4L, -2L, 5L),
      row(3L, 6L, -3L, 5L), row(4L, null, -4L, 5L)))
    val got = Moments.correlationMatrix(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.size == 6)
    // b has a hole: (a,b) is pairwise-complete over 3 rows, (a,c) over 4
    assert(got(("a", "b")) == ((3L, Some(1.0))))
    assert(got(("a", "c")) == ((4L, Some(-1.0))))
    assert(got(("b", "c")) == ((3L, Some(-1.0))))
    // a constant column: zero variance -> NULL r, n intact
    assert(got(("a", "k")) == ((4L, None)))
    // each pair agrees with the scalar operator on its complete rows
    val ab = Moments.pearsonOls(df.filter(col("b").isNotNull), "a", "b")
      .head().getDouble(3)
    assert(got(("a", "b"))._2.contains(ab))
    val e = intercept[IllegalArgumentException] {
      Moments.correlationMatrix(df, Seq("a", "a"))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("correlationMatrixByGroup == ungrouped per group; NULL group; loud") {
    val df = table("g string, a bigint, b bigint, c bigint", Seq(
      row("x", 1L, 2L, -1L), row("x", 2L, 4L, -2L),
      row("x", 3L, 6L, -3L), row("x", 4L, null, -4L),
      row("y", 1L, 1L, 9L), row("y", 2L, 3L, 9L), row("y", 3L, 2L, 9L),
      row(null, 5L, 1L, 2L), row(null, 6L, 2L, 1L),
      row("solo", 7L, 7L, 7L)))
    val cols = Seq("a", "b", "c")
    val got = Moments.correlationMatrixByGroup(df, "g", cols)
    for (g <- Seq("x", "y", "solo")) {
      assertDfEquality(got.filter(col("g") === g).drop("g"),
        Moments.correlationMatrix(df.filter(col("g") === g), cols))
    }
    assertDfEquality(got.filter(col("g").isNull).drop("g"),
      Moments.correlationMatrix(df.filter(col("g").isNull), cols))
    // single-row group: every pair reads n=1, NULL r
    got.filter(col("g") === "solo").collect().foreach { r =>
      assert(r.getLong(3) == 1L && r.isNullAt(4))
    }
    // constant column within a group only nulls THAT group's pairs
    assert(got.filter(col("g") === "y" && col("x_col") === "a" &&
      col("y_col") === "c").head().isNullAt(4))
    assert(!got.filter(col("g") === "x" && col("x_col") === "a" &&
      col("y_col") === "c").head().isNullAt(4))
    val e = intercept[IllegalArgumentException] {
      Moments.correlationMatrixByGroup(df, "g", Seq("g", "a"))
    }
    assert(e.getMessage.contains("group column"))
  }

  test("spearmanRho: monotone reads 1, ties match hand ranks, degenerate NULL") {
    // perfectly monotone but nonlinear: rho = 1, Pearson < 1
    val cubic = table("x bigint, y bigint",
      (1L to 5L).map(i => row(i, i * i * i)))
    assert(Moments.spearmanRho(cubic, "x", "y").head().getDouble(1) == 1.0)
    assert(Moments.pearsonOls(cubic, "x", "y").head().getDouble(3) < 1.0)
    // anti-monotone reads -1
    val anti = table("x bigint, y bigint",
      (1L to 5L).map(i => row(i, -i * i)))
    assert(Moments.spearmanRho(anti, "x", "y").head().getDouble(1) == -1.0)
    // ties: rho equals Pearson over the hand-computed fractional ranks
    val tied = table("x double, y double", Seq(
      row(1.0, 10.0), row(1.0, 20.0), row(2.0, 20.0), row(3.0, 30.0)))
    val got = Moments.spearmanRho(tied, "x", "y").head()
    val handRanks = table("rx double, ry double", Seq(
      row(1.5, 1.0), row(1.5, 2.5), row(3.0, 2.5), row(4.0, 4.0)))
    val exp = Moments.pearsonOls(handRanks, "rx", "ry").head().getDouble(3)
    assert(got.getLong(0) == 4L && got.getDouble(1) == exp)
    // a monotone-order-preserving outlier cannot move rho
    val outlier = table("x bigint, y bigint",
      (1L to 9L).map(i => row(i, if (i == 9L) 1000000L else i)))
    assert(Moments.spearmanRho(outlier, "x", "y").head().getDouble(1) == 1.0)
    // constant axis: NULL rho; NULL holes pairwise-complete
    val const = table("x bigint, y bigint",
      Seq(row(1L, 7L), row(2L, 7L), row(3L, 7L)))
    assert(Moments.spearmanRho(const, "x", "y").head().isNullAt(1))
    val holes = table("x bigint, y bigint", Seq(
      row(1L, 1L), row(2L, 2L), row(null, 9L), row(3L, null), row(4L, 4L)))
    assert(Moments.spearmanRho(holes, "x", "y").head().getLong(0) == 3L)
  }

  test("spearmanRhoByGroup == ungrouped per group; NULL group; degenerates") {
    val df = table("g string, x double, y double", Seq(
      row("a", 1.0, 1.0), row("a", 2.0, 8.0), row("a", 3.0, 27.0),
      row("a", 1.0, 3.0),
      row("b", 1.0, 5.0), row("b", 2.0, 4.0), row("b", 3.0, 3.0),
      row(null, 1.0, 2.0), row(null, 2.0, 1.0),
      row("solo", 9.0, 9.0),
      row("flat", 1.0, 7.0), row("flat", 2.0, 7.0)))
    val got = Moments.spearmanRhoByGroup(df, "g", "x", "y")
    for (g <- Seq("a", "b", "flat")) {
      assertDfEquality(got.filter(col("g") === g).drop("g"),
        Moments.spearmanRho(df.filter(col("g") === g), "x", "y"))
    }
    assertDfEquality(got.filter(col("g").isNull).drop("g"),
      Moments.spearmanRho(df.filter(col("g").isNull), "x", "y"))
    val m = got.collect().map(r => Option(r.getString(0)).getOrElse("∅") ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(m("b") == Some(-1.0) && m("∅") == Some(-1.0))
    assert(m("solo").isEmpty && m("flat").isEmpty)
  }

  test("autocorrelation: AR(1) line, alternating series, partition-invariant") {
    // series 1..5 in time order: pairs lie on y = x + 1 exactly
    val walk = table("t bigint, v bigint",
      (1L to 5L).map(i => row(i, i)))
    val got = Moments.autocorrelation(walk, Seq("t"), "v").head()
    assert(got.toSeq == Seq(4L, 2.5, 3.5, 1.0, 1.0, 1.0))
    // alternating 1,0,1,0,1: every pair flips -> r = -1
    val alt = table("t bigint, v bigint",
      (1L to 5L).map(i => row(i, i % 2)))
    assert(Moments.autocorrelation(alt, Seq("t"), "v").head()
      .getDouble(3) == -1.0)
    // input partitioning cannot change the pairing
    assertDfEquality(
      Moments.autocorrelation(walk.repartition(7), Seq("t"), "v"),
      Moments.autocorrelation(walk, Seq("t"), "v"))
  }

  test("autocorrelationByGroup: no cross-group leak, == filtered per group") {
    // group a descends while group b ascends; a cross-boundary pair
    // (a's last value into b's first) would corrupt both fits
    val df = table("g string, t bigint, v bigint", Seq(
      row("a", 1L, 9L), row("a", 2L, 6L), row("a", 3L, 3L),
      row("b", 1L, 1L), row("b", 2L, 2L), row("b", 3L, 3L),
      row(null, 1L, 5L), row(null, 2L, 5L), row(null, 3L, 5L)))
    val grouped = Moments.autocorrelationByGroup(df, "g", Seq("t"), "v")
    for (g <- Seq("a", "b")) {
      assertDfEquality(
        grouped.filter(col("g") === g).drop("g"),
        Moments.autocorrelation(df.filter(col("g") === g), Seq("t"), "v"))
    }
    assert(grouped.filter(col("g") === "a").head().getDouble(4) == 1.0)
    assert(grouped.filter(col("g") === "b").head().getDouble(4) == 1.0)
    // the NULL group is constant: its own stratum, degenerate r
    val n = grouped.filter(col("g").isNull).head()
    assert(n.getLong(1) == 2L && n.isNullAt(4))
  }

  test("pearsonOlsByGroup: grouped == filtered-ungrouped, NULL group, n=1") {
    val df = table("g string, x bigint, y bigint", Seq(
      row("a", 1L, 2L), row("a", 2L, 1L), row("a", 3L, 4L),
      row("b", 1L, 3L), row("b", 4L, 9L),
      row(null, 2L, 5L), row(null, 6L, 1L),
      row("solo", 7L, 7L)))
    val grouped = Moments.pearsonOlsByGroup(df, "g", "x", "y")
    val a = grouped.filter(col("g") === "a")
      .drop("g")
    assertDfEquality(a,
      Moments.pearsonOls(df.filter(col("g") === "a"), "x", "y"),
      ignoreNullable = true)
    // NULL group is its own stratum, not dropped
    assert(grouped.filter(col("g").isNull).head().getLong(1) == 2L)
    // a 1-row group reads out its means but NULL statistics
    val solo = grouped.filter(col("g") === "solo").head()
    assert(solo.getLong(1) == 1L && solo.getDouble(2) == 7.0 &&
      solo.isNullAt(4) && solo.isNullAt(5) && solo.isNullAt(6))
    // group fold == batch group state
    val folded = Moments.foldGroupMomentState(
      Moments.groupMomentState(df.filter(pmod(col("x"), lit(2L)) === 0L),
        "g", "x", "y"),
      Moments.groupMomentState(df.filter(pmod(col("x"), lit(2L)) === 1L),
        "g", "x", "y"))
    assertDfEquality(
      Moments.bivariateByGroupFromMoments(folded),
      grouped, ignoreRowOrder = true)
  }
}
