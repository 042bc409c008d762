package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile
import graft.testkit.SparkTestKit._

class ProfileSpec extends AnyFunSuite {

  private def frame = table("id bigint, lang string, score int", Seq(
    row(1L, "en", 10),
    row(2L, "en", 10),
    row(3L, "fr", 7),
    row(4L, null, 7),
    row(5L, "de", null),
    row(6L, "en", 3)))

  test("profile: exact null/distinct/min/max per column, one row each") {
    val p = Profile.profile(frame, Seq("id", "lang", "score"),
      exactDistinct = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((6L, 0L, 6L, "1", "6")))
    assert(p("lang") == ((6L, 1L, 3L, "de", "fr")))
    assert(p("score") == ((6L, 1L, 3L, "3", "10")))
  }

  test("profile: HLL path matches exact cardinalities on small frames") {
    // rsd 0.01 is exact-by-construction at these cardinalities; the
    // point is that the default path shares every other statistic.
    val p = Profile.profile(frame, Seq("id", "lang"), rsd = 0.01)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(p("id") == ((0L, 6L)))
    assert(p("lang") == ((1L, 3L)))
  }

  test("profile: unknown column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(frame, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("histogram: hand-computed buckets, clamping, top bucket closed, zero-fill, null skip") {
    val df = table("v double", Seq(
      row(0.0), row(2.5), row(5.0), row(9.9), row(10.0), // 10.0 -> top bucket
      row(-3.0), row(42.0),                              // clamp into edges
      row(null)))                                        // excluded
    val got = Profile.histogram(df, "v", bins = 4, lo = 0.0, hi = 10.0)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    // width 2.5: [0,2.5)={0,-3}, [2.5,5)={2.5}, [5,7.5)={5}, [7.5,10]={9.9,10,42}
    assert(got == Seq(
      (0, 0.0, 2.5, 2L), (1, 2.5, 5.0, 1L),
      (2, 5.0, 7.5, 1L), (3, 7.5, 10.0, 3L)), got.toString)
  }

  test("drift: identical distributions score ~0; a shifted one scores high") {
    val ref = table("v double",
      (1 to 50).map(i => row(i.toDouble)) ++ (1 to 50).map(i => row(i.toDouble + 50)))
    val same = Profile.drift(ref, ref, "v", bins = 10, lo = 1.0, hi = 100.0)
      .agg(sum(col("psi"))).collect()(0).getDouble(0)
    assert(math.abs(same) < 1e-12, s"self-PSI $same")
    // everything moved into the top half
    val cur = table("v double", (1 to 100).map(i => row(50.0 + i / 2.0)))
    val psi = Profile.drift(ref, cur, "v", bins = 10, lo = 1.0, hi = 100.0)
      .agg(sum(col("psi"))).collect()(0).getDouble(0)
    assert(psi > 0.25, s"shifted PSI $psi should flag")
    // empty reference cells hit the eps floor, stay finite
    assert(!psi.isInfinite && !psi.isNaN)
  }

  test("categoricalDrift: self-drift ~0, vanished/new categories eps-floored, NULL groups") {
    val ref = table("c string",
      Seq.fill(60)(row("a")) ++ Seq.fill(30)(row("b")) ++ Seq.fill(10)(row("c")))
    val same = Profile.categoricalDrift(ref, ref, "c")
      .agg(sum(col("psi"))).head().getDouble(0)
    assert(math.abs(same) < 1e-12, s"self-PSI $same")
    // category c vanished, category d appeared: both sides must emit a
    // row with an eps-floored (large, finite) surprise — vanishing IS
    // the signal
    val cur = table("c string",
      Seq.fill(60)(row("a")) ++ Seq.fill(30)(row("b")) ++ Seq.fill(10)(row("d")))
    val out = Profile.categoricalDrift(ref, cur, "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set("a", "b", "c", "d"))
    assert(out("c")._1 == 10L && out("c")._2 == 0L)
    assert(out("d")._1 == 0L && out("d")._2 == 10L)
    assert(out("c")._3 > 0.5 && !out("c")._3.isInfinite)
    assert(out("d")._3 > 0.5 && !out("d")._3.isInfinite)
    assert(math.abs(out("a")._3) < 1e-12 && math.abs(out("b")._3) < 1e-12)
    // NULL categories group as one category
    val withNull = table("c string",
      Seq.fill(5)(row(null.asInstanceOf[String])) ++ Seq.fill(5)(row("a")))
    val nullRow = Profile.categoricalDrift(withNull, withNull, "c")
      .filter(col("category").isNull).collect()
    assert(nullRow.length == 1 && nullRow(0).getLong(1) == 5L)
  }

  test("topValues: top-k by count, ties break by value asc, nulls dropped") {
    val top = Profile.topValues(frame, Seq("lang", "score"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, rs) => c -> rs.map(t => (t._2, t._3)).toSeq }
    // lang: en x3, then de/fr tie at 1 -> "de" wins lexicographically
    assert(top("lang") == Seq(("en", 3L), ("de", 1L)))
    // score: 10 x2 and 7 x2 tie at 2 -> "10" < "7" lexicographically
    assert(top("score") == Seq(("10", 2L), ("7", 2L)))
  }

  test("ksStatistic: hand-computed CDF gap, identical samples, ties, shifted samples") {
    import graft.operators.Profile
    def vals(xs: Double*) = table("v double", xs.map(row(_)))
    // ref = {1,2,3,4}, cur = {3,4,5,6}: CDFs cross maximally at v=2
    // (F_ref = 0.5, F_cur = 0) and v=4 (1.0 vs 0.5) -> D = 0.5
    val d1 = Profile.ksStatistic(vals(1, 2, 3, 4), vals(3, 4, 5, 6), "v")
      .head()
    assert(d1.getLong(0) == 4 && d1.getLong(1) == 4 &&
      d1.getDouble(2) == 0.5, d1.toString)
    // identical samples: D = 0 (the self-drift sanity bound)
    assert(Profile.ksStatistic(vals(1, 2, 2, 9), vals(1, 2, 2, 9), "v")
      .head().getDouble(2) == 0.0)
    // ties evaluate AFTER the tied mass: ref {1,1,1,2} vs cur {1,2,2,2}
    // -> at v=1: |0.75-0.25| = 0.5
    assert(Profile.ksStatistic(vals(1, 1, 1, 2), vals(1, 2, 2, 2), "v")
      .head().getDouble(2) == 0.5)
    // disjoint supports: D = 1
    assert(Profile.ksStatistic(vals(1, 2), vals(10, 11), "v")
      .head().getDouble(2) == 1.0)
    // NULLs are excluded; an all-NULL side fails loudly
    val withNull = table("v double", Seq(row(1.0), row(null)))
    assert(Profile.ksStatistic(withNull, vals(1.0), "v")
      .head().getLong(0) == 1)
    intercept[IllegalArgumentException] {
      Profile.ksStatistic(table("v double", Seq(row(null))), vals(1.0), "v")
    }
  }

  test("wassersteinDistance: hand-computed transport, shift, identity, loud") {
    def side(vs: Seq[Double]) = table("v double", vs.map(row(_)))
    // identical samples: zero distance
    val same = Profile.wassersteinDistance(
      side(Seq(1.0, 2.0, 5.0)), side(Seq(1.0, 2.0, 5.0)), "v").head()
    assert(same.toSeq == Seq(3L, 3L, 0.0))
    // unit point masses one apart: W1 = 1
    assert(Profile.wassersteinDistance(
      side(Seq(0.0)), side(Seq(1.0)), "v").head().getDouble(2) == 1.0)
    // a pure shift by 1 moves every quantile by 1: W1 = 1
    assert(Profile.wassersteinDistance(
      side(Seq(0.0, 1.0, 2.0, 3.0)), side(Seq(1.0, 2.0, 3.0, 4.0)),
      "v").head().getDouble(2) == 1.0)
    // optimal transport with ties: {0,0,2} -> {1} moves 2/3 mass by 1
    // and 1/3 mass by 1: W1 = 1
    assert(Profile.wassersteinDistance(
      side(Seq(0.0, 0.0, 2.0)), side(Seq(1.0)), "v").head().getDouble(2)
      == 1.0)
    // NULLs carry no position; an all-NULL side fails loudly
    val holey = table("v double", Seq(row(3.0), row(null)))
    assert(Profile.wassersteinDistance(holey, side(Seq(3.0)), "v")
      .head().getLong(0) == 1L)
    val e = intercept[IllegalArgumentException] {
      Profile.wassersteinDistance(
        table("v double", Seq(row(null))), side(Seq(1.0)), "v").head()
    }
    assert(e.getMessage.contains("non-null values"))
  }

  test("ksByGroup == ungrouped per filtered group; one-sided group NULL; NULL group") {
    val ref = table("g string, v double", Seq(
      row("a", 1.0), row("a", 2.0), row("a", 3.0),
      row("b", 1.0), row("b", 1.0),
      row(null, 5.0), row(null, 6.0),
      row("ref_only", 9.0)))
    val cur = table("g string, v double", Seq(
      row("a", 2.0), row("a", 3.0), row("a", 4.0),
      row("b", 7.0),
      row(null, 5.0), row(null, 8.0),
      row("cur_only", 1.0)))
    val got = Profile.ksByGroup(ref, cur, "g", "v")
      .collect().map(r => (Option(r.getString(0)),
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // per group, the scalar operator on the filtered slices agrees
    for (g <- Seq("a", "b")) {
      val e = Profile.ksStatistic(ref.filter(col("g") === g),
        cur.filter(col("g") === g), "v").head()
      assert(got(Some(g)) == ((e.getLong(0), e.getLong(1),
        Some(e.getDouble(2)))), s"group $g")
    }
    // NULL group is its own stratum
    val en = Profile.ksStatistic(ref.filter(col("g").isNull),
      cur.filter(col("g").isNull), "v").head()
    assert(got(None) == ((en.getLong(0), en.getLong(1),
      Some(en.getDouble(2)))))
    // one-sided groups report NULL instead of failing the report
    assert(got(Some("ref_only")) == ((1L, 0L, None)))
    assert(got(Some("cur_only")) == ((0L, 1L, None)))
  }

  test("wassersteinByGroup == ungrouped per group; point-mass 0; one-sided NULL") {
    val ref = table("g string, v double", Seq(
      row("a", 0.0), row("a", 1.0), row("a", 2.0), row("a", 3.0),
      row("b", 0.0), row("b", 0.0), row("b", 2.0),
      row(null, 7.0),
      row("point", 5.0), row("ref_only", 9.0)))
    val cur = table("g string, v double", Seq(
      row("a", 1.0), row("a", 2.0), row("a", 3.0), row("a", 4.0),
      row("b", 1.0),
      row(null, 8.0),
      row("point", 5.0), row("cur_only", 1.0)))
    val got = Profile.wassersteinByGroup(ref, cur, "g", "v")
      .collect().map(r => (Option(r.getString(0)),
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    for (g <- Seq("a", "b")) {
      val e = Profile.wassersteinDistance(ref.filter(col("g") === g),
        cur.filter(col("g") === g), "v").head()
      assert(got(Some(g)) == ((e.getLong(0), e.getLong(1),
        Some(e.getDouble(2)))), s"group $g")
    }
    // shift-by-1 group reads exactly 1; NULL group is its own stratum
    assert(got(Some("a"))._3.contains(1.0))
    assert(got(None) == ((1L, 1L, Some(1.0))))
    // both sides on ONE value: a single grid row has no predecessor,
    // and the answer is 0 (the COALESCE), never NULL
    assert(got(Some("point")) == ((1L, 1L, Some(0.0))))
    // one-sided groups report NULL instead of failing the report
    assert(got(Some("ref_only")) == ((1L, 0L, None)))
    assert(got(Some("cur_only")) == ((0L, 1L, None)))
  }

  test("mannWhitney: hand-computed U/delta/z, ties degenerate z, identity") {
    def side(vs: Seq[Double]) = table("v double", vs.map(row(_)))
    // ref strictly below cur: U = 0, delta = -1, z = -2/sqrt(5/3)
    val below = Profile.mannWhitney(
      side(Seq(1.0, 2.0)), side(Seq(3.0, 4.0)), "v").head()
    assert(below.toSeq == Seq(2L, 2L, 0.0, -1.0, -1.549193))
    // mirrored: U = na*nb, delta = +1, z positive
    val above = Profile.mannWhitney(
      side(Seq(3.0, 4.0)), side(Seq(1.0, 2.0)), "v").head()
    assert(above.toSeq == Seq(2L, 2L, 8.0, 1.0, 1.549193))
    // identical samples: U = na*nb/2, delta 0, z 0
    val same = Profile.mannWhitney(
      side(Seq(1.0, 2.0)), side(Seq(1.0, 2.0)), "v").head()
    assert(same.toSeq == Seq(2L, 2L, 4.0, 0.0, 0.0))
    // every value tied: variance degenerates -> z NULL, delta 0
    val tied = Profile.mannWhitney(
      side(Seq(1.0, 1.0)), side(Seq(1.0, 1.0)), "v").head()
    assert(tied.getDouble(2) == 4.0 && tied.getDouble(3) == 0.0 &&
      tied.isNullAt(4))
    val e = intercept[IllegalArgumentException] {
      Profile.mannWhitney(table("v double", Seq(row(null))),
        side(Seq(1.0)), "v").head()
    }
    assert(e.getMessage.contains("non-null values"))
  }

  test("mannWhitneyByGroup == scalar per group; one-sided NULL incl. n=1 tie guard") {
    val ref = table("g string, v double", Seq(
      row("a", 1.0), row("a", 2.0),
      row("b", 3.0), row("b", 4.0),
      row(null, 1.0), row(null, 2.0),
      row("ref_only", 9.0)))
    val cur = table("g string, v double", Seq(
      row("a", 3.0), row("a", 4.0),
      row("b", 1.0), row("b", 2.0),
      row(null, 1.0), row(null, 2.0),
      row("cur_only", 1.0)))
    val got = Profile.mannWhitneyByGroup(ref, cur, "g", "v")
      .collect().map(r => (Option(r.getString(0)), r.toSeq.drop(1))).toMap
    for (g <- Seq("a", "b")) {
      val e = Profile.mannWhitney(ref.filter(col("g") === g),
        cur.filter(col("g") === g), "v").head()
      assert(got(Some(g)) == e.toSeq, s"group $g")
    }
    assert(got(Some("a")) == Seq(2L, 2L, 0.0, -1.0, -1.549193))
    assert(got(Some("b")) == Seq(2L, 2L, 8.0, 1.0, 1.549193))
    // identical NULL-group samples: delta 0, z 0
    assert(got(None) == Seq(2L, 2L, 4.0, 0.0, 0.0))
    // one-sided single-row groups: NULL stats, and the n=1 tie term
    // must not trip the ANSI division guard
    assert(got(Some("ref_only")) == Seq(1L, 0L, null, null, null))
    assert(got(Some("cur_only")) == Seq(0L, 1L, null, null, null))
  }

  test("cramerVonMisesByGroup == scalar per group; one-sided NULL; NULL group") {
    val ref = table("g string, v double", Seq(
      row("a", 0.0), row("a", 1.0),
      row("b", 0.0),
      row(null, 5.0),
      row("ref_only", 9.0)))
    val cur = table("g string, v double", Seq(
      row("a", 0.0), row("a", 1.0),
      row("b", 1.0),
      row(null, 5.0),
      row("cur_only", 1.0)))
    val got = Profile.cramerVonMisesByGroup(ref, cur, "g", "v")
      .collect().map(r => (Option(r.getString(0)), r.toSeq.drop(1))).toMap
    for (g <- Seq("a", "b")) {
      val e = Profile.cramerVonMises(ref.filter(col("g") === g),
        cur.filter(col("g") === g), "v").head()
      assert(got(Some(g)) == e.toSeq, s"group $g")
    }
    // identical mixes 0; {0} vs {1} reads the hand 0.25
    assert(got(Some("a")) == Seq(2L, 2L, 0.0))
    assert(got(Some("b")) == Seq(1L, 1L, 0.25))
    assert(got(None) == Seq(1L, 1L, 0.0))
    assert(got(Some("ref_only")) == Seq(1L, 0L, null))
    assert(got(Some("cur_only")) == Seq(0L, 1L, null))
  }

  test("cramerVonMises: hand-computed pooled L2 gap, identity, loud") {
    def side(vs: Seq[Double]) = table("v double", vs.map(row(_)))
    assert(Profile.cramerVonMises(
      side(Seq(1.0, 2.0, 5.0)), side(Seq(1.0, 2.0, 5.0)), "v")
      .head().toSeq == Seq(3L, 3L, 0.0))
    // {0} vs {1}: gap 1 on the v=0 cell only: T = (1*1/4)*1 = 0.25
    assert(Profile.cramerVonMises(
      side(Seq(0.0)), side(Seq(1.0)), "v").head().toSeq ==
      Seq(1L, 1L, 0.25))
    // {0} vs {0,1}: d(0) = 1 - 1/2, cells (2, 1): T = (2/9)*(2*0.25)
    assert(Profile.cramerVonMises(
      side(Seq(0.0)), side(Seq(0.0, 1.0)), "v").head().toSeq ==
      Seq(1L, 2L, 0.111111))
    val e = intercept[IllegalArgumentException] {
      Profile.cramerVonMises(side(Seq()), side(Seq(1.0)), "v").head()
    }
    assert(e.getMessage.contains("non-null values"))
  }

  test("quantileShift: pure shift reads the shift at every p, identity 0") {
    def side(vs: Seq[Double]) = table("v double", vs.map(row(_)))
    val ps = Seq(0.25, 0.5, 0.75, 1.0)
    val shifted = Profile.quantileShift(
      side(Seq(1.0, 2.0, 3.0, 4.0)), side(Seq(3.0, 4.0, 5.0, 6.0)),
      "v", ps).collect()
    assert(shifted.length == 4)
    shifted.foreach { r =>
      assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
      assert(r.getDouble(5) == 2.0, s"shift at p=${r.getDouble(0)}")
      assert(r.getDouble(4) == r.getDouble(3) + 2.0)
    }
    val same = Profile.quantileShift(
      side(Seq(1.0, 2.0, 3.0)), side(Seq(1.0, 2.0, 3.0)), "v", ps)
      .collect()
    same.foreach(r => assert(r.getDouble(5) == 0.0))
  }

  test("benfordAudit: hand digits, structural zeros, sub-1 values, loud") {
    val df = table("v double", Seq(
      row(1.0), row(15.0), row(2.0), row(19.0), row(0.03),
      row(-3.5), row(null), row(0.0)))
    // digits: 1,1,2,1,3(0.03),3(-3.5) -> n=6; d1=3, d2=1, d3=2
    val got = Profile.benfordAudit(df, "v")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet == (1 to 9).toSet, "all nine digits present")
    assert(got(1) == ((3L, 0.5)) && got(2) == ((1L, 0.166667)) &&
      got(3) == ((2L, 0.333333)))
    (4 to 9).foreach(d => assert(got(d)._1 == 0L, s"digit $d structural"))
    // expected column follows Benford exactly: P(1) = ln2/ln10
    val e1 = Profile.benfordAudit(df, "v")
      .filter(col("digit") === 1).head().getDouble(3)
    assert(e1 == BigDecimal(math.log(2.0) / math.log(10.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val e = intercept[IllegalArgumentException] {
      Profile.benfordAudit(
        table("v double", Seq(row(0.0), row(null))), "v").head()
    }
    assert(e.getMessage.contains("no non-zero values"))
    // |v| >= 1e26 exceeds DECIMAL(38,12): the double-string fallback
    // still reads the first significant digit; NaN/Inf carry none.
    val huge = table("v double", Seq(
      row(7.2e27), row(-3.0e30), row(4.0), row(Double.NaN),
      row(Double.PositiveInfinity)))
    val gotHuge = Profile.benfordAudit(huge, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotHuge(7) == 1L && gotHuge(3) == 1L && gotHuge(4) == 1L)
    assert(gotHuge.values.sum == 3L)
  }

  test("quantileShiftByGroup == ungrouped per group; NULL group; one-sided drops") {
    val ref = table("g string, v double", Seq(
      row("a", 1.0), row("a", 2.0), row("a", 3.0), row("a", 4.0),
      row("b", 10.0), row("b", 20.0),
      row(null, 5.0),
      row("ref_only", 1.0)))
    val cur = table("g string, v double", Seq(
      row("a", 3.0), row("a", 4.0), row("a", 5.0), row("a", 6.0),
      row("b", 10.0), row("b", 30.0),
      row(null, 7.0),
      row("cur_only", 1.0)))
    val ps = Seq(0.5, 1.0)
    val got = Profile.quantileShiftByGroup(ref, cur, "g", "v", ps)
    for (g <- Seq("a", "b")) {
      assertDfEquality(got.filter(col("g") === g).drop("g"),
        Profile.quantileShift(ref.filter(col("g") === g),
          cur.filter(col("g") === g), "v", ps))
    }
    // a pure +2 shift reads 2 at every p for group a
    got.filter(col("g") === "a").collect()
      .foreach(r => assert(r.getDouble(6) == 2.0))
    // NULL group is its own stratum
    assert(got.filter(col("g").isNull).count() == 2L)
    // one-sided groups have no shift to report and drop
    assert(got.filter(col("g").isin("ref_only", "cur_only")).count() == 0L)
  }

  test("benfordAuditByGroup == ungrouped per group; NULL group; per-group zeros") {
    val df = table("g string, v double", Seq(
      row("a", 1.0), row("a", 15.0), row("a", 2.0),
      row("b", 9.0), row("b", 0.0),
      row(null, 3.0), row(null, 0.5)))
    val got = Profile.benfordAuditByGroup(df, "g", "v")
    for (g <- Seq("a", "b")) {
      assertDfEquality(got.filter(col("g") === g).drop("g"),
        Profile.benfordAudit(df.filter(col("g") === g), "v"))
    }
    assertDfEquality(got.filter(col("g").isNull).drop("g"),
      Profile.benfordAudit(df.filter(col("g").isNull), "v"))
    // each group carries its own 9-digit grid including zeros
    assert(got.count() == 27)
    val b = got.filter(col("g") === "b" && col("digit") === 9).head()
    assert(b.getLong(2) == 1L && b.getDouble(3) == 1.0)
  }

  test("jsDivergenceByGroup == scalar per group; one-sided NULL; NULL group") {
    val ref = table("g string, c string", Seq(
      row("a", "x"), row("a", "x"), row("a", "y"),
      row("b", "x"),
      row(null, "z"),
      row("ref_only", "x")))
    val cur = table("g string, c string", Seq(
      row("a", "x"), row("a", "y"), row("a", "y"), row("a", "y"),
      row("b", "y"),
      row(null, "z"),
      row("cur_only", "x")))
    val got = Profile.jsDivergenceByGroup(ref, cur, "g", "c")
      .collect().map(r => (Option(r.getString(0)),
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    for (g <- Seq("a", "b")) {
      val e = Profile.jsDivergence(ref.filter(col("g") === g),
        cur.filter(col("g") === g), "c").head()
      assert(got(Some(g)) == ((e.getLong(0), e.getLong(1), e.getLong(2),
        Some(e.getDouble(3)))), s"group $g")
    }
    // disjoint mixes within group b: exactly ln 2
    assert(got(Some("b"))._4.contains(0.693147))
    // identical NULL-group mixes: 0; one-sided groups NULL
    assert(got(None) == ((1L, 1L, 1L, Some(0.0))))
    assert(got(Some("ref_only"))._4.isEmpty)
    assert(got(Some("cur_only"))._4.isEmpty)
  }

  test("hellingerByGroup == scalar per group; one-sided NULL; NULL group") {
    val ref = table("g string, c string", Seq(
      row("a", "x"), row("a", "x"), row("a", "y"),
      row("b", "x"),
      row(null, "z"),
      row("ref_only", "x")))
    val cur = table("g string, c string", Seq(
      row("a", "x"), row("a", "y"), row("a", "y"), row("a", "y"),
      row("b", "y"),
      row(null, "z"),
      row("cur_only", "x")))
    val got = Profile.hellingerByGroup(ref, cur, "g", "c")
      .collect().map(r => (Option(r.getString(0)), r.toSeq.drop(1))).toMap
    for (g <- Seq("a", "b")) {
      val e = Profile.hellingerDistance(ref.filter(col("g") === g),
        cur.filter(col("g") === g), "c").head()
      assert(got(Some(g)) == e.toSeq, s"group $g")
    }
    // disjoint within b: BC 0, H 1; identical NULL-group mixes: H 0
    assert(got(Some("b")) == Seq(1L, 1L, 2L, 0.0, 1.0))
    assert(got(None) == Seq(1L, 1L, 1L, 1.0, 0.0))
    assert(got(Some("ref_only")) == Seq(1L, 0L, 1L, null, null))
    assert(got(Some("cur_only")) == Seq(0L, 1L, 1L, null, null))
  }

  test("hellingerDistance: identity, disjoint 1, symmetry, loud") {
    def mix(vs: Seq[String]) = table("c string", vs.map(row(_)))
    // identical thirds: per-category sqrt terms sum to exactly 1
    val same = Profile.hellingerDistance(
      mix(Seq("a", "a", "b")), mix(Seq("a", "a", "b")), "c").head()
    assert(same.toSeq == Seq(3L, 3L, 2L, 1.0, 0.0))
    // disjoint supports: BC 0, H 1
    assert(Profile.hellingerDistance(mix(Seq("a")), mix(Seq("b")), "c")
      .head().toSeq == Seq(1L, 1L, 2L, 0.0, 1.0))
    val ab = Profile.hellingerDistance(
      mix(Seq("a", "a", "b")), mix(Seq("a", "b", "b", "b")), "c").head()
    val ba = Profile.hellingerDistance(
      mix(Seq("a", "b", "b", "b")), mix(Seq("a", "a", "b")), "c").head()
    assert(ab.getDouble(4) == ba.getDouble(4))
    assert(ab.getDouble(4) > 0.0 && ab.getDouble(4) < 1.0)
    val e = intercept[IllegalArgumentException] {
      Profile.hellingerDistance(mix(Seq()), mix(Seq("a")), "c").head()
    }
    assert(e.getMessage.contains("both sides"))
  }

  test("jsDivergence: identity 0, disjoint ln2, symmetry, NULL category, loud") {
    def mix(vs: Seq[String]) = table("c string", vs.map(row(_)))
    val same = Profile.jsDivergence(
      mix(Seq("a", "a", "b")), mix(Seq("a", "a", "b")), "c").head()
    assert(same.toSeq == Seq(3L, 3L, 2L, 0.0))
    // fully disjoint supports: JSD = ln 2
    assert(Profile.jsDivergence(mix(Seq("a")), mix(Seq("b")), "c")
      .head().getDouble(3) == 0.693147)
    // symmetric by construction
    val ab = Profile.jsDivergence(
      mix(Seq("a", "a", "b")), mix(Seq("a", "b", "b", "b")), "c").head()
    val ba = Profile.jsDivergence(
      mix(Seq("a", "b", "b", "b")), mix(Seq("a", "a", "b")), "c").head()
    assert(ab.getDouble(3) == ba.getDouble(3))
    assert(ab.getDouble(3) > 0.0 && ab.getDouble(3) < 0.693147)
    // NULL categories group as ONE category on both sides
    val withNull = table("c string", Seq(row("a"), row(null)))
    val n = Profile.jsDivergence(withNull, withNull, "c").head()
    assert(n.toSeq == Seq(2L, 2L, 2L, 0.0))
    val e = intercept[IllegalArgumentException] {
      Profile.jsDivergence(mix(Seq()), mix(Seq("a")), "c").head()
    }
    assert(e.getMessage.contains("both sides"))
  }

  test("exactQuantiles: hand-computed discrete ranks, duplicates, NULLs, validation") {
    // values {1,2,2,3,10}: n=5; p=0.2 -> rank 1 -> 1; p=0.5 -> rank 3
    // -> 2 (the duplicate mass); p=0.6 -> rank 3 -> 2; p=0.61 -> rank
    // 4 -> 3; p=1.0 -> rank 5 -> 10
    val df = table("v double", Seq(1.0, 2.0, 2.0, 3.0, 10.0).map(row(_)))
    val got = Profile.exactQuantiles(df, "v", Seq(0.2, 0.5, 0.6, 0.61, 1.0))
      .collect().map(r => (r.getDouble(0), r.getDouble(2))).toMap
    assert(got == Map(0.2 -> 1.0, 0.5 -> 2.0, 0.6 -> 2.0,
      0.61 -> 3.0, 1.0 -> 10.0), got.toString)
    // NULLs carry no rank; n excludes them
    val withNulls = table("v double", Seq(row(5.0), row(null), row(7.0)))
    val r2 = Profile.exactQuantiles(withNulls, "v", Seq(0.5)).head()
    assert(r2.getLong(1) == 2L && r2.getDouble(2) == 5.0, r2.toString)
    intercept[IllegalArgumentException] {
      Profile.exactQuantiles(df, "v", Nil)
    }
    intercept[IllegalArgumentException] {
      Profile.exactQuantiles(df, "v", Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Profile.exactQuantiles(df, "v", Seq(0.5, 0.5))
    }
    intercept[IllegalArgumentException] { // all-NULL: empty count state
      Profile.exactQuantiles(table("v double", Seq(row(null))), "v", Seq(0.5))
    }
  }

  test("exactQuantilesByGroup == ungrouped per filtered group; NULL group; skew") {
    val rnd = new scala.util.Random(61)
    // skewed: g0 holds 80% of rows — the shape the global-prefix path
    // exists for — plus a NULL group
    val df = table("g string, v double",
      (0 until 500).map(i => row(
        if (i % 10 < 8) "g0" else if (i % 10 == 8) "g1" else null,
        rnd.nextInt(40).toDouble)))
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    val grouped = Profile.exactQuantilesByGroup(df, "g", "v", ps).collect()
    assert(grouped.length == 3 * ps.length)
    Seq(Some("g0"), Some("g1"), None).foreach { g =>
      val part = df.filter(g.map(col("g") === _).getOrElse(col("g").isNull))
      val solo = Profile.exactQuantiles(part, "v", ps)
        .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
      val mine = grouped
        .filter(r => if (g.isEmpty) r.isNullAt(0) else !r.isNullAt(0) && r.getString(0) == g.get)
        .map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3)))
      assert(mine.toSeq == solo.toSeq, s"group $g: ${mine.toSeq} vs ${solo.toSeq}")
    }
    intercept[IllegalArgumentException] {
      Profile.exactQuantilesByGroup(df, "g", "v", Seq(1.5))
    }
  }

  test("weightedExactQuantiles: mass ranks, zero/NULL drop, negative weight loud") {
    // values 1 (mass 1), 2 (mass 8), 10 (mass 1): W=10; p=0.1 -> rank
    // 1 -> 1; p=0.11 -> rank 2 -> 2; p=0.9 -> rank 9 -> 2; p=0.91 ->
    // rank 10 -> 10
    val df = table("v double, w bigint", Seq(
      row(1.0, 1L), row(2.0, 5L), row(2.0, 3L), row(10.0, 1L),
      row(3.0, 0L),          // zero mass: dropped
      row(4.0, null),        // NULL mass: dropped
      row(null, 7L)))        // NULL value: dropped
    val got = Profile.weightedExactQuantiles(df, "v", "w",
        Seq(0.1, 0.11, 0.9, 0.91))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0.1, 10L, 1.0), (0.11, 10L, 2.0),
      (0.9, 10L, 2.0), (0.91, 10L, 10.0)), got.mkString("; "))
    val neg = table("v double, w bigint", Seq(row(1.0, -2L)))
    val e = intercept[Throwable] {
      Profile.weightedExactQuantiles(neg, "v", "w", Seq(0.5)).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("negative weight"), msgs.take(300))
  }

  test("weightedExactQuantiles: fractional weight fails loudly, integral-valued double passes") {
    // ADVICE r15: a double weight column must not silently truncate —
    // 2.7 is a loud error, not mass 2
    val frac = table("v double, w double", Seq(row(1.0, 2.7)))
    val e = intercept[Throwable] {
      Profile.weightedExactQuantiles(frac, "v", "w", Seq(0.5)).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("non-negative integer"), msgs.take(300))
    // integral-VALUED doubles carry their exact mass
    val ok = table("v double, w double", Seq(row(1.0, 2.0), row(5.0, 8.0)))
    val got = Profile.weightedExactQuantiles(ok, "v", "w", Seq(0.2, 0.21))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0.2, 10L, 1.0), (0.21, 10L, 5.0)),
      got.mkString("; "))
  }

  test("weightedExactQuantilesByGroup == weightedExactQuantiles per filtered group; skew; NULL group") {
    val rnd = new scala.util.Random(67)
    val df = table("g string, v double, w bigint",
      (0 until 400).map(i => row(
        if (i % 10 < 8) "g0" else if (i % 10 == 8) "g1" else null,
        rnd.nextInt(30).toDouble, (rnd.nextInt(5) + 1).toLong)) ++
        Seq(row("g1", 3.0, 0L), row("g1", 4.0, null))) // zero/NULL mass drop
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    val grouped = Profile.weightedExactQuantilesByGroup(
      df, "g", "v", "w", ps).collect()
    assert(grouped.length == 3 * ps.length)
    Seq(Some("g0"), Some("g1"), None).foreach { g =>
      val part = df.filter(g.map(col("g") === _).getOrElse(col("g").isNull))
      val solo = Profile.weightedExactQuantiles(part, "v", "w", ps)
        .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
      val mine = grouped
        .filter(r => if (g.isEmpty) r.isNullAt(0)
          else !r.isNullAt(0) && r.getString(0) == g.get)
        .map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3)))
      assert(mine.toSeq == solo.toSeq, s"group $g: ${mine.toSeq} vs ${solo.toSeq}")
    }
    val neg = table("g string, v double, w bigint", Seq(row("g0", 1.0, -2L)))
    val e = intercept[Throwable] {
      Profile.weightedExactQuantilesByGroup(neg, "g", "v", "w", Seq(0.5))
        .collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("negative weight"), msgs.take(300))
  }

  test("categoricalAssociationByGroup == ungrouped per filtered group; NULL group; degenerate group") {
    val rnd = new scala.util.Random(71)
    val df = table("g string, a string, b string",
      (0 until 300).map(i => row(
        if (i % 7 == 0) null else s"g${i % 3}",
        s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(3)}")) ++
        // a constant-axis group: dof 0, V NULL — must not crash the plan
        Seq(row("gc", "onlyA", "b0"), row("gc", "onlyA", "b1")))
    val grouped = Profile.categoricalAssociationByGroup(df, "g", "a", "b")
      .collect()
    assert(grouped.length == 5, grouped.mkString("; ")) // g0 g1 g2 gc NULL
    Seq(Some("g0"), Some("g1"), Some("g2"), None).foreach { g =>
      val part = df.filter(g.map(col("g") === _).getOrElse(col("g").isNull))
      val solo = Profile.categoricalAssociation(part, "a", "b").head()
      val mine = grouped.find(r =>
        if (g.isEmpty) r.isNullAt(0)
        else !r.isNullAt(0) && r.getString(0) == g.get).get
      assert(mine.toSeq.drop(1) == solo.toSeq, s"group $g: $mine vs $solo")
    }
    val gc = grouped.find(r => !r.isNullAt(0) && r.getString(0) == "gc").get
    assert(gc.getLong(2) == 0L && gc.getDouble(3) == 0.0 && gc.isNullAt(4),
      gc.toString)
    intercept[IllegalArgumentException] {
      Profile.categoricalAssociationByGroup(df, "g", "a", "a")
    }
    intercept[IllegalArgumentException] {
      Profile.categoricalAssociationByGroup(df, "g", "g", "b")
    }
  }

  test("categoricalAssociation: dependence, independence, NULL category, degenerate axis") {
    // perfect dependence over 2x2 with 4 rows each pairing: chi2 = n,
    // V = 1, MI = ln 2
    val dep = table("a string, b string",
      Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")).map(t => row(t._1, t._2)))
    val d = Profile.categoricalAssociation(dep, "a", "b").head()
    assert(d.getLong(0) == 4L && d.getLong(1) == 1L, d.toString)
    assert(d.getDouble(2) == 4.0 && d.getDouble(3) == 1.0, d.toString)
    assert(math.abs(d.getDouble(4) - math.log(2.0)) < 1e-6, d.toString)
    // exact independence (balanced 2x2): chi2 = 0, MI = 0, V = 0
    val ind = table("a string, b string",
      Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).map(t => row(t._1, t._2)))
    val i = Profile.categoricalAssociation(ind, "a", "b").head()
    assert(i.getDouble(2) == 0.0 && i.getDouble(3) == 0.0 &&
      i.getDouble(4) == 0.0, i.toString)
    // NULL is its own category: a (null, p) row widens the grid
    val withNull = table("a string, b string",
      Seq(row("x", "p"), row(null, "p"), row("y", "q")))
    val nres = Profile.categoricalAssociation(withNull, "a", "b").head()
    assert(nres.getLong(0) == 3L && nres.getLong(1) == 2L, nres.toString)
    // a constant axis: dof 0, chi2 0, MI 0, V NULL (0/0, not a crash)
    val const = table("a string, b string",
      Seq(row("x", "p"), row("y", "p")))
    val c = Profile.categoricalAssociation(const, "a", "b").head()
    assert(c.getLong(1) == 0L && c.getDouble(2) == 0.0 &&
      c.isNullAt(3) && c.getDouble(4) == 0.0, c.toString)
    intercept[IllegalArgumentException] {
      Profile.categoricalAssociation(dep, "a", "a")
    }
    intercept[IllegalArgumentException] {
      Profile.categoricalAssociation(dep.limit(0), "a", "b")
    }
  }

  test("quantile sketch: merge proof — any split folds to the batch state") {
    val df = table("id bigint, v double",
      (0 until 500).map(i => row(i.toLong, (i * 37 % 211).toDouble)))
    val k = 64
    val batch = Profile.sketchStateOf(df, "v", "id", k)
      .orderBy("__qh", "__qid").collect().map(_.toSeq).toSeq
    // three very different splits, folded in different orders
    val splits = Seq(
      Seq(df.filter(col("id") < 100), df.filter(col("id") >= 100)),
      Seq(df.filter(col("id") % 3 === 0), df.filter(col("id") % 3 === 1),
        df.filter(col("id") % 3 === 2)),
      Seq(df.filter(col("id") >= 450), df.filter(col("id") < 450)))
    splits.foreach { parts =>
      val folded = parts.map(Profile.sketchStateOf(_, "v", "id", k))
        .reduce(Profile.foldSketchState(_, _, k))
        .orderBy("__qh", "__qid").collect().map(_.toSeq).toSeq
      assert(folded == batch, "fold must be bit-identical to batch")
    }
    // idempotent: folding the state with itself changes nothing
    val st = Profile.sketchStateOf(df, "v", "id", k)
    val self = Profile.foldSketchState(st, st, k)
      .orderBy("__qh", "__qid").collect().map(_.toSeq).toSeq
    assert(self == batch)
  }

  test("quantile sketch report: exact when data fits the sample; gate holds") {
    // n = 100 <= k = 128: the sample IS the data, estimates are the
    // exact discrete quantiles and rank error vs ceil(p*n) is bounded
    // by the tie structure (here all-distinct: exactly 0)
    val df = table("id bigint, v double",
      (1 to 100).map(i => row(i.toLong, i.toDouble)))
    val got = Profile.sketchQuantiles(df, "v", "id",
        ps = Seq(0.25, 0.5, 0.9), k = 128)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(got(0.25) == ((100L, 100L, 25.0, 0L, true)))
    assert(got(0.5) == ((100L, 100L, 50.0, 0L, true)))
    assert(got(0.9) == ((100L, 100L, 90.0, 0L, true)))
    // the DKW gate holds on a big frame at a small k too
    val big = table("id bigint, v double",
      (0 until 20000).map(i => row(i.toLong, ((i * 7919) % 65536).toDouble)))
    val rep = Profile.sketchQuantiles(big, "v", "id",
      ps = Seq(0.25, 0.5, 0.9), k = 256).collect()
    rep.foreach(r => assert(r.getBoolean(5),
      s"rank error ${r.getLong(4)} broke the bound at p=${r.getDouble(0)}"))
    // guards: NULL ids loud, bad p loud, k bounds loud
    intercept[IllegalArgumentException] {
      Profile.sketchStateOf(
        table("id bigint, v double",
          Seq(row(null.asInstanceOf[java.lang.Long], 1.0))),
        "v", "id", 64)
    }
    intercept[IllegalArgumentException] {
      Profile.sketchQuantiles(df, "v", "id", Seq(0.0), k = 64)
    }
    intercept[IllegalArgumentException] {
      Profile.sketchStateOf(df, "v", "id", 8)
    }
  }

  test("grouped sketch state: equals the ungrouped sketch of each slice") {
    // the house grouped==filtered-ungrouped identity: the per-group
    // bottom-k via the bounded-heap aggregator retains EXACTLY the
    // rows the global TakeOrdered retains on the filtered slice
    val df = table("g string, id bigint, v double",
      (0 until 600).map(i =>
        row(s"g${i % 3}", i.toLong, (i * 37 % 211).toDouble)))
    val k = 32
    val grouped = Profile.sketchStateByGroup(df, "g", "v", "id", k)
    (0 until 3).foreach { gi =>
      val slice = grouped.filter(col("__qg") === s"g$gi")
        .select("__qh", "__qid", "__qv")
        .orderBy("__qh", "__qid").collect().map(_.toSeq).toSeq
      val solo = Profile.sketchStateOf(
          df.filter(col("g") === s"g$gi"), "v", "id", k)
        .orderBy("__qh", "__qid").collect().map(_.toSeq).toSeq
      assert(slice == solo, s"group g$gi diverged from its solo sketch")
    }
  }

  test("grouped sketch: keyed merge proof — any split folds to batch") {
    val df = table("g string, id bigint, v double",
      (0 until 500).map(i =>
        row(s"g${i % 2}", i.toLong, (i * 53 % 197).toDouble)))
    val k = 32
    val batch = Profile.sketchStateByGroup(df, "g", "v", "id", k)
      .orderBy("__qg", "__qh", "__qid").collect().map(_.toSeq).toSeq
    val splits = Seq(
      Seq(df.filter(col("id") < 100), df.filter(col("id") >= 100)),
      Seq(df.filter(col("id") % 3 === 0), df.filter(col("id") % 3 === 1),
        df.filter(col("id") % 3 === 2)))
    splits.foreach { parts =>
      val folded = parts.map(Profile.sketchStateByGroup(_, "g", "v", "id", k))
        .reduce(Profile.foldSketchStateByGroup(_, _, k))
        .orderBy("__qg", "__qh", "__qid").collect().map(_.toSeq).toSeq
      assert(folded == batch, "keyed fold must be bit-identical to batch")
    }
    val st = Profile.sketchStateByGroup(df, "g", "v", "id", k)
    val self = Profile.foldSketchStateByGroup(st, st, k)
      .orderBy("__qg", "__qh", "__qid").collect().map(_.toSeq).toSeq
    assert(self == batch, "self-fold must be idempotent")
  }

  test("grouped sketch report: exact per group when data fits; guards") {
    // two groups of 50 distinct values each, k = 128 >= both: the
    // sample IS each group's data, estimates exact, rank error 0
    val df = table("g string, id bigint, v double",
      (1 to 50).flatMap(i => Seq(
        row("a", i.toLong, i.toDouble),
        row("b", (1000 + i).toLong, (i * 10).toDouble))))
    val got = Profile.sketchQuantilesByGroup(df, "g", "v", "id",
        ps = Seq(0.5, 0.9), k = 128)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
          r.getBoolean(6))).toMap
    assert(got(("a", 0.5)) == ((50L, 50L, 25.0, 0L, true)))
    assert(got(("a", 0.9)) == ((50L, 50L, 45.0, 0L, true)))
    assert(got(("b", 0.5)) == ((50L, 50L, 250.0, 0L, true)))
    assert(got(("b", 0.9)) == ((50L, 50L, 450.0, 0L, true)))
    // NULL group is its own group (the exactQuantilesByGroup rule)
    val withNull = table("g string, id bigint, v double",
      (1 to 30).map(i => row(if (i % 2 == 0) "a" else null,
        i.toLong, i.toDouble)))
    val gs = Profile.sketchQuantilesByGroup(withNull, "g", "v", "id",
        ps = Seq(0.5), k = 64)
      .collect().map(r => Option(r.getString(0)))
    assert(gs.toSet == Set(Some("a"), None), gs.mkString(","))
    // duplicate id WITHIN a group is loud; same id ACROSS groups is fine
    intercept[IllegalArgumentException] {
      Profile.sketchStateByGroup(
        table("g string, id bigint, v double",
          Seq(row("a", 1L, 1.0), row("a", 1L, 2.0))),
        "g", "v", "id", 64)
    }
    val cross = Profile.sketchStateByGroup(
      table("g string, id bigint, v double",
        Seq(row("a", 1L, 1.0), row("b", 1L, 2.0))),
      "g", "v", "id", 64)
    assert(cross.count() == 2L)
  }
}
