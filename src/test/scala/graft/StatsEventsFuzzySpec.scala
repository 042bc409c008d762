package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Events, Fuzzy, Stats}
import graft.testkit.SparkTestKit._

/** Edge-case specs for the round-9 operators — the contracts the
  * oracle queries (q88-q92) can't exercise: loud-failure paths, NULL
  * and degenerate-group handling, and the greedy funnel semantics. */
class StatsEventsFuzzySpec extends AnyFunSuite {

  // --------------------------------------------------------- Fuzzy

  test("fuzzy pairs: in-block near matches found, cross-block matches not candidates") {
    val df = table("id bigint, text string", Seq(
      row(1L, "alpha beta gamma"),
      row(2L, "alpha beta gamme"),   // 1 edit from id 1, same block prefix
      row(3L, "alpha beta delta"),   // 4-5 edits from id 1 — past maxDist
      row(4L, "omega beta gamma"))) // 1 edit cluster but different block
    val got = Fuzzy.blockedFuzzyPairs(df, "id", "text",
        keyLen = 16, blockLen = 5, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1)))
  }

  test("fuzzy pairs: oversize block fails loudly by default, dropped on opt-in") {
    val df = table("id bigint, text string",
      (1L to 10L).map(i => row(i, s"prefix shared by all $i")))
    val strict = intercept[Throwable] {
      Fuzzy.blockedFuzzyPairs(df, "id", "text",
        keyLen = 16, blockLen = 5, maxDist = 2, maxBucket = 4).count()
    }
    val messages = Iterator.iterate(strict)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("maxBucket=4"), messages.take(500))
    val dropped = Fuzzy.blockedFuzzyPairs(df, "id", "text",
      keyLen = 16, blockLen = 5, maxDist = 2, maxBucket = 4,
      dropOversize = true)
    assert(dropped.count() == 0L)
  }

  test("fuzzy pairs: oversize guard is count-first — decided BELOW the list aggregation") {
    // The guard must act on the window-counted cardinality before
    // collect_list can materialize a bucket: in the optimized plan the
    // raise_error filter is a CHILD of the collect_list aggregate (tree
    // prints top-down, so the aggregate's offset comes first). The old
    // size(collect_list(...)) formulation had them inverted — and a
    // degenerate bucket OOM'd the aggregation buffer before the guard
    // could fire.
    val df = table("id bigint, text string",
      (1L to 10L).map(i => row(i, s"prefix shared by all $i")))
    val plan = Fuzzy.blockedFuzzyPairs(df, "id", "text",
        keyLen = 16, blockLen = 5, maxDist = 2, maxBucket = 4)
      .queryExecution.optimizedPlan.toString
    val agg = plan.indexOf("collect_list")
    val guard = plan.indexOf("raise_error")
    assert(agg >= 0 && guard >= 0 && agg < guard,
      s"collect_list@$agg raise_error@$guard\n${plan.take(2000)}")
  }

  // --------------------------------------------------------- Stats

  test("changePointScan: hand step, earliest-k ties, boundary, loud") {
    // level shift after the 3rd point: 0,0,0,10,10 -> argmax at k=3,
    // |S_3 - (3/5)*20| = 12
    val step = table("t string, v double", Seq(
      row("a", 0.0), row("b", 0.0), row("c", 0.0),
      row("d", 10.0), row("e", 10.0)))
    assert(Stats.changePointScan(step, Seq("t"), "v").head().toSeq ==
      Seq(5L, 3L, "c", 12.0))
    // a perfectly linear ramp ties k=1 and k=2 exactly -> earliest k
    val ramp = table("t string, v double", Seq(
      row("a", 0.0), row("b", 5.0), row("c", 10.0)))
    assert(Stats.changePointScan(ramp, Seq("t"), "v").head().toSeq ==
      Seq(3L, 1L, "a", 5.0))
    // two points: the only candidate k=1
    assert(Stats.changePointScan(
      table("t string, v double", Seq(row("a", 0.0), row("b", 10.0))),
      Seq("t"), "v").head().toSeq == Seq(2L, 1L, "a", 5.0))
    // NULL values carry no level; fewer than 2 points fails loudly
    val e = intercept[IllegalArgumentException] {
      Stats.changePointScan(
        table("t string, v double", Seq(row("a", 1.0), row("b", null))),
        Seq("t"), "v").head()
    }
    assert(e.getMessage.contains(">= 2 series points"))
  }

  test("changePointScanByGroup == ungrouped per group; single point; NULL group") {
    val df = table("g string, t string, v double", Seq(
      row("a", "t1", 0.0), row("a", "t2", 0.0), row("a", "t3", 0.0),
      row("a", "t4", 10.0), row("a", "t5", 10.0),
      row("b", "t1", 5.0), row("b", "t2", 0.0),
      row(null, "t1", 1.0), row(null, "t2", 2.0), row(null, "t3", 3.0),
      row("solo", "t1", 7.0)))
    val got = Stats.changePointScanByGroup(df, "g", Seq("t"), "v")
    for (g <- Seq("a", "b")) {
      assertDfEquality(got.filter(col("g") === g).drop("g"),
        Stats.changePointScan(df.filter(col("g") === g), Seq("t"), "v"),
        ignoreNullable = true)
    }
    assert(got.filter(col("g") === "a").head().toSeq ==
      Seq("a", 5L, 3L, "t3", 12.0))
    // NULL group is its own stratum; its linear ramp ties exactly at
    // k=1 and k=2 -> earliest k
    val n = got.filter(col("g").isNull).head()
    assert(n.getLong(1) == 3L && n.getLong(2) == 1L && n.getDouble(4) == 1.0)
    // a single-point group reads k=1 with zero excursion, not a crash
    assert(got.filter(col("g") === "solo").head().toSeq ==
      Seq("solo", 1L, 1L, "t1", 0.0))
  }

  test("zScore: known groups standardize; degenerate groups yield NULL") {
    val df = table("g string, v bigint", Seq(
      row("a", 1L), row("a", 2L), row("a", 3L), // mean 2, sd 1
      row("b", 7L),                             // single row: sd undefined
      row("c", 5L), row("c", 5L)))              // zero variance
    val got = Stats.zScore(df, Seq("g"), "v", "z")
      .orderBy("g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(got == Seq(("a", 1L, -1.0), ("a", 2L, 0.0), ("a", 3L, 1.0),
      ("b", 7L, null), ("c", 5L, null), ("c", 5L, null)))
  }

  test("zScore: a NULL group is its own stratum, not dropped (window semantics)") {
    val df = table("g string, v bigint", Seq(
      row(null, 1L), row(null, 2L), row(null, 3L), row("a", 9L)))
    val got = Stats.zScore(df, Seq("g"), "v", "z")
      .orderBy("v")
      .collect().map(r => (Option(r.getString(0)),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(got == Seq((None, -1.0), (None, 0.0), (None, 1.0), (Some("a"), null)))
  }

  test("winsorize: NULL values stay NULL instead of clipping to the lo bound") {
    val df = table("g string, v bigint",
      (1L to 16L).map(i => row("a", i)) :+ row("a", null))
    val got = Stats.winsorize(df, Seq("g"), "v", "w", lo = 0.25, hi = 0.75)
      .filter(col("v").isNull).collect()
    assert(got.length == 1 && got.head.isNullAt(2), got.toSeq.toString)
  }

  test("zScore: matches the window formulation on random frames with NULLs") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    val groups = Array("a", "b", null)
    (1 to 3).foreach { _ =>
      val rows = (1L to 60L).map { i =>
        row(i, groups(rnd.nextInt(3)),
          if (rnd.nextInt(10) == 0) null else rnd.nextInt(100).toLong)
      }
      val df = table("id bigint, g string, v bigint", rows)
      val got = Stats.zScore(df, Seq("g"), "v", "z")
        .select("id", "z").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
        .toMap
      val w = Window.partitionBy("g")
      val exp = df.withColumn("__m", avg(col("v")).over(w))
        .withColumn("__s", stddev_samp(col("v")).over(w))
        .select(col("id"),
          when(col("__s") > 0, (col("v") - col("__m")) / col("__s")).as("z"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
        .toMap
      assert(got.keySet == exp.keySet) // no rows dropped — NULL groups included
      got.foreach { case (id, z) =>
        (z, exp(id)) match {
          case (null, null) =>
          case (a: java.lang.Double, b: java.lang.Double) =>
            assert(math.abs(a - b) < 1e-9, s"id $id: $a vs $b")
          case (a, b) => fail(s"id $id: $a vs $b")
        }
      }
    }
  }

  test("zScore: reserved temp column collision fails loudly") {
    val df = table("g string, v bigint, __mean double", Seq(row("a", 1L, 0.0)))
    val e = intercept[IllegalArgumentException] {
      Stats.zScore(df, Seq("g"), "v", "z")
    }
    assert(e.getMessage.contains("__mean"))
  }

  test("winsorize: values clip into the exact interpolated percentile bounds") {
    val df = table("g string, v bigint", (1L to 16L).map(i => row("a", i)))
    // p25 over 1..16: r = 0.25*15 = 3.75 -> 4 + 0.75 = 4.75
    // p75:            r = 0.75*15 = 11.25 -> 12 + 0.25 = 12.25
    val got = Stats.winsorize(df, Seq("g"), "v", "w", lo = 0.25, hi = 0.75)
      .orderBy("v").collect().map(_.getDouble(2)).toSeq
    assert(got.head == 4.75 && got.last == 12.25, got.toString)
    assert(got(7) == 8.0) // interior value untouched
  }

  test("weightedSample: deterministic, nested under k, excludes non-positive weights") {
    import graft.operators.General
    val df = table("id bigint, w bigint",
      ((1L to 40L).map(i => row(i, i)) :+ row(41L, 0L) :+ row(42L, null)))
    val top5 = General.weightedSample(df, "id", "w", 5)
      .collect().map(_.getLong(0)).toSet
    val top10 = General.weightedSample(df, "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert(top5.subsetOf(top10), s"$top5 not nested in $top10") // A-Res keys are fixed per row
    assert(!top10.contains(41L) && !top10.contains(42L)) // w<=0 / NULL excluded
    // rerun-stable: same call, same set
    assert(General.weightedSample(df, "id", "w", 5)
      .collect().map(_.getLong(0)).toSet == top5)
  }

  test("weightedSample: NULL ids never backfill an undersubscribed top-k") {
    import graft.operators.General
    // fewer valid rows than k: a NULL id's NULL A-Res key sorts last
    // under desc, so without the explicit id filter it would slip into
    // the sample exactly here
    val df = table("id bigint, w bigint",
      Seq(row(1L, 10L), row(2L, 20L), row(null, 30L)))
    val got = General.weightedSample(df, "id", "w", 5)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), got.toString)
  }

  // --------------------------------------------------------- Events

  test("decayWeightedSum: one-half-life-old events count half") {
    val day = 86400000000L // µs
    val df = table("u bigint, t_us bigint, v double", Seq(
      row(1L, 3 * day, 1.0), // the max timestamp: weight 1
      row(1L, 2 * day, 1.0), // one half-life old: 0.5
      row(1L, 1 * day, 1.0)) // two: 0.25
    ).select(col("u"), timestamp_micros(col("t_us")).as("ts"), col("v"))
    val got = Events.decayWeightedSum(df, Seq("u"), "ts", "v",
      halfLifeSec = 86400.0)
    val r = got.collect().head
    assert(math.abs(r.getDouble(1) - 1.75) < 1e-12, r.toString)
    assert(r.getLong(2) == 3L)
  }

  test("cohortRetention: offsets measured in whole weeks from the cohort Monday") {
    val day = 86400000000L // µs; epoch day 0 = Thursday 1970-01-01
    // Monday 1970-01-05 = day 4
    val df = table("u bigint, t_us bigint", Seq(
      row(1L, 4 * day),        // first event: cohort Monday 01-05, offset 0
      row(1L, 10 * day),       // Sunday 01-11, same week: offset 0
      row(1L, 19 * day),       // 01-20, two weeks later: offset 2
      row(2L, 12 * day))       // cohort Monday 01-12, offset 0
    ).select(col("u"), timestamp_micros(col("t_us")).as("ts"))
    val got = Events.cohortRetention(df, "u", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(("1970-01-05", 0, 1L), ("1970-01-05", 2, 1L),
      ("1970-01-12", 0, 1L)))
  }

  test("kaplanMeier: hand-computed curve with censoring carried forward") {
    // events at 1,2,4; censored at 3,5:
    // S(1)=4/5=0.8, S(2)=0.8*3/4=0.6, S(3)=0.6 (censor only),
    // S(4)=0.6*1/2=0.3, S(5)=0.3
    val df = table("dur double, obs boolean", Seq(
      row(1.0, true), row(2.0, true), row(3.0, false),
      row(4.0, true), row(5.0, false)))
    val got = Events.kaplanMeier(df, "dur", "obs").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1.0, 5L, 1L, 0L, 0.8), (2.0, 4L, 1L, 0L, 0.6),
      (3.0, 3L, 0L, 1L, 0.6), (4.0, 2L, 1L, 0L, 0.3),
      (5.0, 1L, 0L, 1L, 0.3)))
  }

  test("kaplanMeier: tied event times share one risk set") {
    // two events at t=1 out of 4: S(1) = 1 - 2/4 = 0.5
    // at t=2: one event, one censor, n=2: S(2) = 0.5 * 0.5 = 0.25
    val df = table("dur double, obs boolean", Seq(
      row(1.0, true), row(1.0, true), row(2.0, false), row(2.0, true)))
    val got = Events.kaplanMeier(df, "dur", "obs").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1.0, 4L, 2L, 0L, 0.5), (2.0, 2L, 1L, 1L, 0.25)))
  }

  test("kaplanMeier: exhausted risk set reads exactly 0; censoring differs") {
    val df = table("dur double, obs boolean", Seq(
      row(1.0, true), row(2.0, true), row(2.0, true)))
    val got = Events.kaplanMeier(df, "dur", "obs").collect()
    assert(got(0).getDouble(4) == 0.666667)
    assert(got(1).getDouble(4) == 0.0)
    // the SAME durations censored instead: survival never drops to 0
    val cen = table("dur double, obs boolean", Seq(
      row(1.0, true), row(2.0, false), row(2.0, false)))
    val got2 = Events.kaplanMeier(cen, "dur", "obs").collect()
    assert(got2(1).getDouble(4) == 0.666667)
  }

  test("kaplanMeier: NULLs excluded, negative and empty loud") {
    val df = table("dur double, obs boolean", Seq(
      row(1.0, true), row(2.0, true), row(null, true), row(3.0, null)))
    assert(Events.kaplanMeier(df, "dur", "obs").count() == 2L)
    val e1 = intercept[IllegalArgumentException] {
      Events.kaplanMeier(table("dur double, obs boolean",
        Seq(row(-1.0, true))), "dur", "obs").head()
    }
    assert(e1.getMessage.contains("negative duration"))
    val e2 = intercept[IllegalArgumentException] {
      Events.kaplanMeier(table("dur double, obs boolean",
        Seq(row(null, true))), "dur", "obs").head()
    }
    assert(e2.getMessage.contains("no complete"))
  }

  test("nelsonAalen: hand-computed hazard, exhausted risk set is finite") {
    val df = table("dur double, obs boolean", Seq(
      row(1.0, true), row(2.0, true), row(3.0, false),
      row(4.0, true), row(5.0, false)))
    // H: 1/5=0.2, +1/4=0.45, +0, +1/2=0.95, +0
    val got = Events.nelsonAalen(df, "dur", "obs").collect()
      .map(r => (r.getDouble(0), r.getDouble(4)))
    assert(got.toSeq == Seq((1.0, 0.2), (2.0, 0.45), (3.0, 0.45),
      (4.0, 0.95), (5.0, 0.95)))
    // d = n contributes exactly 1 — no infinity special case
    val ex = table("dur double, obs boolean", Seq(
      row(1.0, true), row(2.0, true), row(2.0, true)))
    val got2 = Events.nelsonAalen(ex, "dur", "obs").collect()
    assert(got2(0).getDouble(4) == 0.333333 &&
      got2(1).getDouble(4) == 1.333333)
  }

  test("rmst: step-area with clipping and the past-grid tail") {
    val df = table("dur double, obs boolean", Seq(
      row(1.0, true), row(2.0, true), row(3.0, false),
      row(4.0, true), row(5.0, false)))
    // S: 0.8, 0.6, 0.6, 0.3, 0.3 at t = 1..5
    def r(tau: Double) = Events.rmst(df, "dur", "obs", tau).head()
    assert(r(4.5).getDouble(3) == 3.15) // 1+0.8+0.6+0.6+0.15
    assert(r(7.0).getDouble(3) == 3.9)  // 3.3 in-grid + 0.3*2 tail
    assert(r(0.5).getDouble(3) == 0.5)  // clipped first segment only
    val row45 = r(4.5)
    assert(row45.getDouble(0) == 4.5 && row45.getLong(1) == 5L &&
      row45.getLong(2) == 3L)
    intercept[IllegalArgumentException] {
      Events.rmst(df, "dur", "obs", 0.0)
    }
  }

  test("nelsonAalenByGroup == ungrouped per group; NULL group") {
    val df = table("g string, dur double, obs boolean", Seq(
      row("a", 1.0, true), row("a", 2.0, true), row("a", 3.0, false),
      row("b", 1.0, true), row("b", 1.0, true), row("b", 2.0, true),
      row(null, 1.0, true), row(null, 2.0, false)))
    val got = Events.nelsonAalenByGroup(df, "g", "dur", "obs")
    for (g <- Seq("a", "b")) {
      assertDfEquality(got.filter(col("g") === g).drop("g"),
        Events.nelsonAalen(df.filter(col("g") === g), "dur", "obs"))
    }
    assertDfEquality(got.filter(col("g").isNull).drop("g"),
      Events.nelsonAalen(df.filter(col("g").isNull), "dur", "obs"))
    // b exhausts its risk set: hazard increments by exactly 1, finite
    val b = got.filter(col("g") === "b").collect()
    assert(b(0).getDouble(5) == 0.666667 && b(1).getDouble(5) == 1.666667)
  }

  test("rmstByGroup == ungrouped per group; group-boundary lag is clean") {
    val df = table("g string, dur double, obs boolean", Seq(
      row("a", 1.0, true), row("a", 2.0, true), row("a", 3.0, false),
      row("a", 4.0, true), row("a", 5.0, false),
      // b's grid starts HIGH: a leaked lag from a's tail would corrupt
      // b's before-grid segment
      row("b", 10.0, true), row("b", 20.0, false),
      row(null, 2.0, true)))
    val tau = 4.5
    val got = Events.rmstByGroup(df, "g", "dur", "obs", tau)
    for (g <- Seq("a", "b")) {
      assertDfEquality(got.filter(col("g") === g).drop("g"),
        Events.rmst(df.filter(col("g") === g), "dur", "obs", tau))
    }
    assertDfEquality(got.filter(col("g").isNull).drop("g"),
      Events.rmst(df.filter(col("g").isNull), "dur", "obs", tau))
    val m = got.collect().map(r => Option(r.getString(0)).getOrElse("∅")
      -> r.getDouble(4)).toMap
    assert(m("a") == 3.15)
    assert(m("b") == 4.5, "b never drops inside tau: full 4.5 at S=1")
    intercept[IllegalArgumentException] {
      Events.rmstByGroup(df, "g", "dur", "obs", -1.0)
    }
  }

  test("cumulativeIncidence: hand case, no-censoring identity, bias vs 1-KM") {
    // (1,'a'), (2,'b'), (3, censored): CIF_a(1)=1/3, CIF_b(2)=(2/3)/2
    val df = table("dur double, ev string", Seq(
      row(1.0, "a"), row(2.0, "b"), row(3.0, null)))
    val got = Events.cumulativeIncidence(df, "dur", "ev").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(4)))
    assert(got.toSeq == Seq(("a", 1.0, 0.333333), ("b", 2.0, 0.333333)))
    // no censoring: CIF_a + CIF_b + S == 1 at the last time
    val full = table("dur double, ev string", Seq(
      row(1.0, "a"), row(2.0, "b"), row(3.0, "a")))
    val cif = Events.cumulativeIncidence(full, "dur", "ev").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(4)))
    assert(cif.toSeq == Seq(("a", 1.0, 0.333333), ("a", 3.0, 0.666667),
      ("b", 2.0, 0.333333)))
    // the naive per-cause 1-KM (competitors as censoring) OVERESTIMATES:
    // for cause 'a' it reads 1 - (2/3)(0) at t=3 -> 1.0 > CIF_a = 2/3
    val naiveA = Events.kaplanMeier(
      full.select(col("dur"), (col("ev") === "a").as("obs")),
      "dur", "obs")
      .orderBy(col("t").desc).limit(1).head().getDouble(4)
    assert(1.0 - naiveA > 0.666667 + 1e-9,
      s"naive 1-KM must exceed the honest CIF (got ${1.0 - naiveA})")
  }

  test("kaplanMeierByGroup == ungrouped per group; NULL group; negative carry") {
    // group b's ln terms are NEGATIVE from its first row: the
    // first-row carry recovery must not use a min() offset
    val df = table("g string, dur double, obs boolean", Seq(
      row("a", 1.0, true), row("a", 2.0, true), row("a", 3.0, false),
      row("b", 1.0, true), row("b", 1.0, true), row("b", 2.0, false),
      row("b", 2.0, true),
      row(null, 1.0, true), row(null, 2.0, false)))
    val got = Events.kaplanMeierByGroup(df, "g", "dur", "obs")
    for (g <- Seq("a", "b")) {
      assertDfEquality(got.filter(col("g") === g).drop("g"),
        Events.kaplanMeier(df.filter(col("g") === g), "dur", "obs"))
    }
    assertDfEquality(got.filter(col("g").isNull).drop("g"),
      Events.kaplanMeier(df.filter(col("g").isNull), "dur", "obs"))
    // hand values: group b is the tied-events case
    val b = got.filter(col("g") === "b").collect()
    assert(b(0).getDouble(5) == 0.5 && b(1).getDouble(5) == 0.25)
  }

  test("logRankTest: hand-computed two-sample case") {
    // A: events at 1, 3; B: event at 2, censored at 4
    // t=1: oe=0.5, v=0.25; t=2: oe=-1/3, v=2/9; t=3: oe=0.5, v=0.25
    val df = table("g string, dur double, obs boolean", Seq(
      row("A", 1.0, true), row("A", 3.0, true),
      row("B", 2.0, true), row("B", 4.0, false)))
    val r = Events.logRankTest(df, "g", "dur", "obs").head()
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L && r.getLong(4) == 3L)
    // O_a = 2 (t=1, t=3 are A's); E_a = 0.5 + 1/3 + 0.5
    assert(r.getLong(5) == 2L && r.getDouble(6) == 1.333333)
    assert(r.getDouble(7) == 0.666667) // 0.5 - 0.333333333333 + 0.5
    assert(r.getDouble(8) == 0.722222) // 0.25 + 0.222222222222 + 0.25
    val z = r.getDouble(9)
    assert(math.abs(z - 0.666666666667 / math.sqrt(0.722222222222)) < 1e-5)
    assert(r.getDouble(10) == BigDecimal(z * z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // HR = (2 / (4/3)) / (1 / (5/3)) = 1.5 / 0.6 = 2.5
    assert(r.getDouble(11) == 2.5)
  }

  test("logRankTest: identical groups read zero; group count is loud") {
    val base = Seq((1.0, true), (2.0, true), (3.0, false), (5.0, true))
    val df = table("g string, dur double, obs boolean",
      base.flatMap { case (t, o) => Seq(row("x", t, o), row("y", t, o)) })
    val r = Events.logRankTest(df, "g", "dur", "obs").head()
    assert(r.getDouble(7) == 0.0 && r.getDouble(9) == 0.0 &&
      r.getDouble(10) == 0.0)
    assert(r.getDouble(11) == 1.0, "identical groups: hazard ratio 1")
    val e = intercept[IllegalArgumentException] {
      Events.logRankTest(
        table("g string, dur double, obs boolean",
          Seq(row("a", 1.0, true), row("b", 1.0, true),
            row("c", 1.0, true))),
        "g", "dur", "obs")
    }
    assert(e.getMessage.contains("exactly 2 groups"))
  }

  test("logRankTestK: k=2 agrees with the two-sample test") {
    val df = table("g string, dur double, obs boolean", Seq(
      row("A", 1.0, true), row("A", 3.0, true),
      row("B", 2.0, true), row("B", 4.0, false)))
    val rk = Events.logRankTestK(df, "g", "dur", "obs")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rk("A")
    // per-group O/E/V match the two-sample hand values exactly
    assert(a.getLong(1) == 2L && a.getLong(2) == 2L)
    assert(a.getDouble(3) == 1.333333 && a.getDouble(4) == 0.666667)
    assert(a.getDouble(5) == 0.722222)
    assert(rk("B").getDouble(4) == -0.666667)
    assert(a.getLong(7) == 1L, "df = k-1")
    // chi2 equals z^2 from the two-sample formulation up to the two
    // final-digit rounding paths (decimal quadratic form vs r6(z)^2)
    val z = Events.logRankTest(df, "g", "dur", "obs").head().getDouble(9)
    assert(math.abs(a.getDouble(6) - z * z) < 2e-6,
      s"chi2 ${a.getDouble(6)} vs z^2 ${z * z}")
  }

  test("logRankTestK: identical groups read exactly zero; guards are loud") {
    val base = Seq((1.0, true), (2.0, true), (3.0, false), (5.0, true))
    val df = table("g string, dur double, obs boolean",
      base.flatMap { case (t, o) =>
        Seq(row("x", t, o), row("y", t, o), row("z", t, o))
      })
    val got = Events.logRankTestK(df, "g", "dur", "obs").collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getDouble(4) == 0.0 && r.getDouble(6) == 0.0 &&
        r.getLong(7) == 2L, r.toString)
    }
    // one group: loud
    val e1 = intercept[IllegalArgumentException] {
      Events.logRankTestK(
        table("g string, dur double, obs boolean",
          Seq(row("a", 1.0, true), row("a", 2.0, true))),
        "g", "dur", "obs")
    }
    assert(e1.getMessage.contains("2..9"))
    // more than maxGroups: loud, and bounded (limit-probe)
    val many = table("g string, dur double, obs boolean",
      (0 until 30).map(i => row(s"g$i", 1.0, true)))
    val e2 = intercept[IllegalArgumentException] {
      Events.logRankTestK(many, "g", "dur", "obs")
    }
    assert(e2.getMessage.contains("10+"))
  }

  test("logRankTestK: ties and an exhausted risk set contribute honestly") {
    // t=1: three tied events (one per group) leaves 3 at risk;
    // t=2: d == n (every remaining subject dies) -> V term is 0
    // (n-d = 0) but O/E still count
    val df = table("g string, dur double, obs boolean", Seq(
      row("a", 1.0, true), row("a", 2.0, true),
      row("b", 1.0, true), row("b", 2.0, true),
      row("c", 1.0, true), row("c", 2.0, true)))
    val got = Events.logRankTestK(df, "g", "dur", "obs")
      .collect().map(r => r.getString(0) -> r).toMap
    // perfectly balanced: every group O = E = 2, oe = 0
    Seq("a", "b", "c").foreach { g =>
      assert(got(g).getLong(2) == 2L && got(g).getDouble(3) == 2.0)
      assert(got(g).getDouble(4) == 0.0)
    }
    // t=1 contributes v = 3*(1/3)*(2/3)*(6-3)/5 per diagonal;
    // t=2 contributes 0 (n-d = 0): V_aa = 3*(1/3)*(2/3)*3/5 = 0.4
    assert(got("a").getDouble(5) == 0.4)
    assert(got("a").getDouble(6) == 0.0)
  }

  test("logRankTestK: constant-strata equals unstratified; strata sum O-E") {
    val rows = (0 until 40).map { i =>
      row(if (i % 3 == 0) "hi" else "lo",
        if (i % 2 == 0) "s1" else "s2",
        (i % 7 + 1).toDouble, i % 5 != 0)
    }
    val df = table("g string, s string, dur double, obs boolean", rows)
    val un = Events.logRankTestK(df, "g", "dur", "obs").collect()
    val const = Events.logRankTestK(
      df.withColumn("cs", lit("")), "g", "dur", "obs", Some("cs"))
      .collect()
    assert(un.map(_.toSeq).toSeq == const.map(_.toSeq).toSeq,
      "a constant stratum must not change anything")
    // the stratified O-E is the SUM of per-stratum O-E (per group)
    val strat = Events.logRankTestK(df, "g", "dur", "obs", Some("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val perS = Seq("s1", "s2").map { sv =>
      Events.logRankTestK(df.filter(col("s") === sv), "g", "dur", "obs")
        .collect().map(r => r.getString(0) -> r).toMap
    }
    Seq("hi", "lo").foreach { g =>
      val sumOe = perS.map(_(g).getDouble(4)).sum
      assert(math.abs(strat(g).getDouble(4) - sumOe) < 1e-6, g)
      val sumV = perS.map(_(g).getDouble(5)).sum
      assert(math.abs(strat(g).getDouble(5) - sumV) < 1e-6, g)
      assert(strat(g).getLong(1) == perS.map(_(g).getLong(1)).sum)
    }
    // stratified differs from pooled when strata are informative
    assert(strat("hi").getDouble(6) != un.head.getDouble(6) ||
      strat("hi").getDouble(4) != un.head.getDouble(4))
  }

  test("rollingWindow: range bounds are inclusive and equal timestamps are peers") {
    val df = table("u bigint, t_us bigint, v double", Seq(
      row(1L, 0L, 1.0),
      row(1L, 30000000L, 1.0),           // 30s
      row(1L, 3600000000L, 1.0),         // exactly windowSec after t=0: included
      row(1L, 3700000000L, 1.0),         // sees only [100s, 3700s]
      row(2L, 100000000L, 2.0),          // peer pair: same user, same ts
      row(2L, 100000000L, 3.0))
    ).select(col("u"), timestamp_micros(col("t_us")).as("ts"), col("v"))
    val got = Events.rollingWindow(df, "u", "ts", "v", 3600L, "w")
      .select(col("u"), unix_micros(col("ts")).as("t"), col("n_w"), col("sum_w"))
      .orderBy("u", "t", "sum_w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 0L, 1L, 1.0), (1L, 30000000L, 2L, 2.0),
      (1L, 3600000000L, 3L, 3.0), (1L, 3700000000L, 2L, 2.0),
      (2L, 100000000L, 2L, 5.0), (2L, 100000000L, 2L, 5.0)))
  }

  test("funnelSorted: agrees with the join formulation on random event streams") {
    val rnd = new scala.util.Random(17)
    val types = Array("view", "click", "buy", "noise")
    (1 to 3).foreach { _ =>
      val rows = (1L to 120L).map { i =>
        row(rnd.nextInt(8).toLong, rnd.nextInt(40).toLong * 1000000L,
          types(rnd.nextInt(4)))
      }
      val df = table("u bigint, t_us bigint, ty string", rows)
        .select(col("u"), timestamp_micros(col("t_us")).as("ts"), col("ty"))
      def collect(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getInt(1),
          r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4))).toSet
      val viaJoins = collect(
        Events.funnel(df, "u", "ts", "ty", Seq("view", "click", "buy")))
      val viaScan = collect(
        Events.funnelSorted(df, "u", "ts", "ty", Seq("view", "click", "buy")))
      assert(viaScan == viaJoins)
    }
  }

  test("funnel: greedy earliest chain, strictly-after steps, depth per key") {
    val df = table("u bigint, t_us bigint, ty string", Seq(
      // u1 completes in order
      row(1L, 10L, "view"), row(1L, 20L, "click"), row(1L, 30L, "buy"),
      // u2: pre-view click ignored; the click bound (50) has no buy after
      row(2L, 10L, "click"), row(2L, 20L, "view"), row(2L, 30L, "buy"),
      row(2L, 50L, "click"),
      // u3: buy BEFORE the greedy click bound does not count
      row(3L, 10L, "view"), row(3L, 40L, "click"), row(3L, 20L, "buy"),
      // u4 never views: not in the result at all
      row(4L, 10L, "click"), row(4L, 20L, "buy"))
    ).select(col("u"), timestamp_micros(col("t_us")).as("ts"), col("ty"))
    val got = Events.funnel(df, "u", "ts", "ty", Seq("view", "click", "buy"))
      .orderBy("u")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(4)) null else r.getLong(4))).toSeq
    assert(got == Seq((1L, 3, 20L), (2L, 2, null), (3L, 2, null)))
  }

  test("temporalSplit: band boundaries half-open, NULL ts gets NULL split") {
    // cutoff 100, embargo 20: train < 80, embargo [80, 100), test >= 100
    val df = table("event_id bigint, t_us bigint", Seq(
        row(1L, 79L), row(2L, 80L), row(3L, 99L), row(4L, 100L),
        row(5L, 150L)))
      .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"))
      .unionByName(table("event_id bigint, t_us bigint", Seq(row(6L, 0L)))
        .select(col("event_id"),
          timestamp_micros(col("t_us")).as("ts"))
        .withColumn("ts", when(col("event_id") === 6L,
          lit(null).cast("timestamp")).otherwise(col("ts"))))
    val got = Events.temporalSplit(df, "ts", cutoffUs = 100L, embargoUs = 20L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getString(2)))
      .toSeq
    assert(got == Seq((1L, "train"), (2L, "embargo"), (3L, "embargo"),
      (4L, "test"), (5L, "test"), (6L, null)), got.toString)
    intercept[IllegalArgumentException] {
      Events.temporalSplit(df, "ts", 100L, -1L)
    }
  }

  test("rateAnomalies: trailing baseline flags spikes, cold start suppressed") {
    // type a: window counts 2, 2, 2, 10 at 100µs windows; type b steady 5s.
    def ev(t: Long, ty: String) = row(t, t, ty)
    val rows =
      Seq(10L, 20L, 110L, 120L, 210L, 220L).map(ev(_, "a")) ++
      (301L to 310L).map(ev(_, "a")) ++
      Seq(10L, 20L, 30L, 40L, 50L, 110L, 120L, 130L, 140L, 150L,
        210L, 220L, 230L, 240L, 250L, 310L, 320L, 330L, 340L, 350L)
        .map(ev(_, "b"))
    val df = table("event_id bigint, t_us bigint, event_type string", rows)
      .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"),
        col("event_type"))
    val got = Events.rateAnomalies(df, "ts", "event_type",
        windowUs = 100L, trailing = 6, z = 3.0, minPrior = 3)
      .orderBy("event_type", "window_start_us").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2),
        r.getInt(5), r.getBoolean(6))).toSeq
    assert(got == Seq(
      ("a", 0L, 2L, 0, false),     // no baseline yet
      ("a", 100L, 2L, 1, false),   // sd of 1 window is NULL
      ("a", 200L, 2L, 2, false),   // below minPrior
      ("a", 300L, 10L, 3, true),   // 10 > 2 + 3*0 — flagged
      ("b", 0L, 5L, 0, false),
      ("b", 100L, 5L, 1, false),
      ("b", 200L, 5L, 2, false),
      ("b", 300L, 5L, 3, false)),  // 5 > 5 is false — steady stays quiet
      got.toString)
  }

  test("attributeConversions: linear split, window bounds half-open, orphan conversions dropped") {
    def ev(rows: Seq[(Long, Long, Long, String)]) =
      table("u bigint, t_us bigint, eid bigint, et string",
          rows.map { case (u, t, e, ty) => row(u, t, e, ty) })
        .select(col("u"), timestamp_micros(col("t_us")).as("ts"),
          col("eid"), col("et"))
    val df = ev(Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "purchase"),     // both touches qualify -> 1/2 each
      (1L, 50L, 4L, "purchase"),     // t=30 is a purchase, not a touch;
                                     //   touches 10, 20 within 50-100
      (2L, 10L, 5L, "view"),
      (2L, 200L, 6L, "purchase"),    // touch at 200-100=100 bound: 10 <= 100
                                     //   fails the strict > -> orphan
      (3L, 70L, 7L, "view"),
      (3L, 70L, 8L, "purchase")))    // equal ts: touch_ts <= conv_ts holds
    val got = Events.attributeConversions(df, "u", "ts", "et", "eid",
        Seq("view", "click"), "purchase", lookbackUs = 100L)
      .orderBy("conv_id", "touch_id").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getString(4), r.getDouble(6)))
      .toSeq
    assert(got == Seq(
      (3L, 1L, "view", 0.5), (3L, 2L, "click", 0.5),
      (4L, 1L, "view", 0.5), (4L, 2L, "click", 0.5),
      (8L, 7L, "view", 1.0)), got.toString)
  }

  test("attributeConversions: last_touch picks the latest, ties by id; validation raises") {
    val df = table("u bigint, t_us bigint, eid bigint, et string", Seq(
        row(1L, 10L, 1L, "view"), row(1L, 20L, 2L, "view"),
        row(1L, 20L, 3L, "click"),   // tied with eid 2 — higher id wins
        row(1L, 30L, 4L, "purchase")))
      .select(col("u"), timestamp_micros(col("t_us")).as("ts"),
        col("eid"), col("et"))
    val got = Events.attributeConversions(df, "u", "ts", "et", "eid",
        Seq("view", "click"), "purchase", lookbackUs = 100L,
        model = "last_touch")
      .collect().map(r => (r.getLong(3), r.getDouble(6))).toSeq
    assert(got == Seq((3L, 1.0)), got.toString)
    intercept[IllegalArgumentException] {
      Events.attributeConversions(df, "u", "ts", "et", "eid",
        Seq("view", "purchase"), "purchase", 100L)
    }
    intercept[IllegalArgumentException] {
      Events.attributeConversions(df, "u", "ts", "et", "eid",
        Seq("view"), "purchase", 100L, model = "first_touch")
    }
  }

  test("iqrOutlierFlags: fences hand-computed, NULL stays NULL, k=0 tightens") {
    // group g: values 1..4 and an outlier 100
    // q1 = 2 (pos (5-1)*0.25 = 1), q3 = 4 (pos 3), iqr = 2
    // fences: [2 - 3, 4 + 3] = [-1, 7] -> only 100 flags
    val df = table("g string, v double", Seq(
      row("g", 1.0), row("g", 2.0), row("g", 3.0), row("g", 4.0),
      row("g", 100.0), row("g", null)))
    val got = Stats.iqrOutlierFlags(df, Seq("g"), "v")
      .orderBy("v").collect()
      .map(r => (Option(r.get(1)), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toSeq
    assert(got.forall(t => t._2 == -1.0 && t._3 == 7.0), got.toString)
    assert(got.map(_._4) == Seq(None, Some(false), Some(false), Some(false),
      Some(false), Some(true)), got.toString)
    // k=0: fences collapse to the quartiles themselves
    val tight = Stats.iqrOutlierFlags(df, Seq("g"), "v", k = 0.0)
      .filter(col("v") === 1.0).collect()(0)
    assert(tight.getDouble(2) == 2.0 && tight.getDouble(3) == 4.0)
    assert(tight.getBoolean(4))
    intercept[IllegalArgumentException] {
      Stats.iqrOutlierFlags(df, Seq("g"), "v", k = -1.0)
    }
  }

  test("robustOutlierFlags: hand-computed MAD fences, contamination, MAD=0 limit") {
    // g: 1..5 and outlier 100. median of (1,2,3,4,5,100) = 3.5
    // deviations (2.5, 1.5, 0.5, 0.5, 1.5, 96.5) -> MAD = 1.5
    // fences: 3.5 -+ 3.5/0.6745*1.5 = [-4.283172, 11.283172] (6dp)
    val df = table("g string, v double", Seq(
      row("g", 1.0), row("g", 2.0), row("g", 3.0), row("g", 4.0),
      row("g", 5.0), row("g", 100.0), row("g", null)))
    val got = Stats.robustOutlierFlags(df, Seq("g"), "v")
      .orderBy("v").collect()
      .map(r => (Option(r.get(1)), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toSeq
    val loExp = math.rint((3.5 - 3.5 / 0.6745 * 1.5) * 1e6) / 1e6
    val hiExp = math.rint((3.5 + 3.5 / 0.6745 * 1.5) * 1e6) / 1e6
    assert(got.forall(t => t._2 == loExp && t._3 == hiExp), got.toString)
    assert(got.map(_._4) == Seq(None, Some(false), Some(false), Some(false),
      Some(false), Some(false), Some(true)), got.toString)
    // the IQR fence on the same data ALSO flags 100 — but under 40%
    // contamination the MAD fence holds where the IQR one collapses:
    // (1, 2, 3, 100, 101): med 3, MAD 2 -> 100/101 flagged
    val contaminated = table("g string, v double", Seq(
      row("g", 1.0), row("g", 2.0), row("g", 3.0),
      row("g", 100.0), row("g", 101.0)))
    val f = Stats.robustOutlierFlags(contaminated, Seq("g"), "v")
      .orderBy("v").collect().map(_.getBoolean(4)).toSeq
    assert(f == Seq(false, false, false, true, true), f.toString)
    // MAD = 0 (constant majority): fences collapse onto the median —
    // everything off it flags, the |z| -> infinity limit
    val constant = table("g string, v double", Seq(
      row("g", 7.0), row("g", 7.0), row("g", 7.0), row("g", 9.0)))
    val cf = Stats.robustOutlierFlags(constant, Seq("g"), "v")
      .orderBy("v").collect().map(_.getBoolean(4)).toSeq
    assert(cf == Seq(false, false, false, true), cf.toString)
    intercept[IllegalArgumentException] {
      Stats.robustOutlierFlags(df, Seq("g"), "v", k = 0.0)
    }
  }

  test("quantile family: approx flag agrees with exact within the sketch's rank error") {
    // Uniform integers 1..4000 across 2 groups: rank error n/accuracy
    // translates directly into VALUE error (values spaced 1 apart), so
    // the agreement bound is checkable. n = 2000 per group, accuracy
    // 10000 -> rank error <= 0.2, allow slack of a few values.
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).flatMap { i =>
      Seq(row("a", i.toDouble), row("b", (i * 2).toDouble))
    }
    val df = table("g string, v double", rnd.shuffle(rows))
    val tol = 4.0 // values per unit rank, x2 group spacing, + slack
    // winsorize bounds: compare the clipped outputs value-by-value
    val ex = Stats.winsorize(df, Seq("g"), "v", "w", lo = 0.1, hi = 0.9)
      .orderBy("g", "v").collect().map(_.getDouble(2))
    val ap = Stats.winsorize(df, Seq("g"), "v", "w", lo = 0.1, hi = 0.9,
        exact = false)
      .orderBy("g", "v").collect().map(_.getDouble(2))
    assert(ex.zip(ap).forall { case (e, a) => math.abs(e - a) <= tol },
      s"max winsorize gap ${ex.zip(ap).map(t => math.abs(t._1 - t._2)).max}")
    // IQR fences
    val exF = Stats.iqrOutlierFlags(df, Seq("g"), "v")
      .select("g", "lo_fence", "hi_fence").distinct()
      .orderBy("g").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val apF = Stats.iqrOutlierFlags(df, Seq("g"), "v", exact = false)
      .select("g", "lo_fence", "hi_fence").distinct()
      .orderBy("g").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    exF.zip(apF).foreach { case ((el, eh), (al, ah)) =>
      // fences scale rank error by (1 + k): k=1.5 -> 2.5x, plus slack
      assert(math.abs(el - al) <= 3 * tol && math.abs(eh - ah) <= 3 * tol,
        s"fences exact ($el,$eh) vs approx ($al,$ah)")
    }
    // MAD fences
    val exM = Stats.robustOutlierFlags(df, Seq("g"), "v")
      .select("g", "lo_fence", "hi_fence").distinct()
      .orderBy("g").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val apM = Stats.robustOutlierFlags(df, Seq("g"), "v", exact = false)
      .select("g", "lo_fence", "hi_fence").distinct()
      .orderBy("g").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    exM.zip(apM).foreach { case ((el, eh), (al, ah)) =>
      // median error compounds through the MAD pass and the k/0.6745
      // amplification (~5.2x at k=3.5): generous but still tight
      // enough to catch a wrong-percentile or wrong-cast bug
      assert(math.abs(el - al) <= 8 * tol && math.abs(eh - ah) <= 8 * tol,
        s"MAD fences exact ($el,$eh) vs approx ($al,$ah)")
    }
    intercept[IllegalArgumentException] {
      Stats.winsorize(df, Seq("g"), "v", "w", exact = false, approxAccuracy = 0)
    }
  }

  test("quantileBucketize: hand-computed quartiles, cutpoint ties land low, NULLs") {
    // nine values (1,2,3,4,4.5,5,6,7,8): interpolated quartile
    // cutpoints land exactly on 3 / 4.5 / 6 -> the strictly-below rule
    // puts each ON-cutpoint value in the LOWER bucket (3 -> bucket 1,
    // 4.5 -> 2, 6 -> 3)
    val df = table("g string, v double",
      (1 to 8).map(i => row("g", i.toDouble)) ++
        Seq(row("g", 4.5), row("g", null)))
    val got = Stats.quantileBucketize(df, Seq("g"), "v", 4, "b")
      .orderBy(col("v").asc_nulls_last).collect()
      .map(r => (Option(r.get(1)), if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .toSeq
    assert(got.map(_._2) == Seq(Some(1), Some(1), Some(1), Some(2), Some(2),
      Some(3), Some(3), Some(4), Some(4), None), got.toString)
    // approx flag agrees on well-separated data
    val big = table("g string, v double",
      (1 to 1000).map(i => row("g", i.toDouble)))
    val ex = Stats.quantileBucketize(big, Seq("g"), "v", 4, "b")
      .groupBy("b").count().orderBy("b").collect().map(_.getLong(1)).toSeq
    val ap = Stats.quantileBucketize(big, Seq("g"), "v", 4, "b",
        exact = false)
      .groupBy("b").count().orderBy("b").collect().map(_.getLong(1)).toSeq
    assert(ex.zip(ap).forall { case (e, a) => math.abs(e - a) <= 2 },
      s"$ex vs $ap")
    intercept[IllegalArgumentException] {
      Stats.quantileBucketize(df, Seq("g"), "v", 1, "b")
    }
  }

  test("rankNormalize: mid-rank percentiles, deterministic ties, NULLs, per-group") {
    // group g: values (10, 20, 20, 40) with ids 1..4 -> ranks 1..4
    // (the tie at 20 breaks by id), pct = (r - .5)/4
    val df = table("id bigint, g string, v double", Seq(
      row(1L, "g", 10.0), row(2L, "g", 20.0), row(3L, "g", 20.0),
      row(4L, "g", 40.0), row(5L, "h", 7.0), row(6L, "h", null)))
    val got = Stats.rankNormalize(df, Seq("g"), "v", "id", "pct")
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == Seq(1L -> Some(0.125), 2L -> Some(0.375),
      3L -> Some(0.625), 4L -> Some(0.875),
      5L -> Some(0.5),            // a 1-row group sits at its midpoint
      6L -> None), got.toString)  // NULL value -> NULL pct, row kept
    intercept[IllegalArgumentException] {
      Stats.rankNormalize(df, Nil, "v", "id", "pct")
    }
  }

  test("bootstrapMeanCI: deterministic, brackets the mean, Poisson weights sane") {
    val rnd = new scala.util.Random(31)
    val df = table("id bigint, v double",
      (0L until 800L).map(i => row(i, 10.0 + rnd.nextGaussian())))
    val r1 = Stats.bootstrapMeanCI(df, "v", "id", nBoot = 60,
      salt = "s1").head()
    val (n, nb, m, lo, hi) = (r1.getLong(0), r1.getLong(1),
      r1.getDouble(2), r1.getDouble(3), r1.getDouble(4))
    assert(n == 800L && nb == 60L)
    assert(lo < m && m < hi, r1.toString)
    // the CI of an 800-sample N(10, 1) mean is tight around 10
    assert(lo > 9.5 && hi < 10.5, r1.toString)
    // width ~ 2*1.96/sqrt(800) ~ 0.14: sane, not degenerate
    assert(hi - lo > 0.02 && hi - lo < 0.5, r1.toString)
    // deterministic: rerun identical; new salt draws a different CI
    assert(Stats.bootstrapMeanCI(df, "v", "id", nBoot = 60,
      salt = "s1").head().toSeq == r1.toSeq)
    assert(Stats.bootstrapMeanCI(df, "v", "id", nBoot = 60,
      salt = "s2").head().getDouble(3) != lo)
    // NULL values excluded from n and the resample
    val withNulls = table("id bigint, v double",
      (0L until 50L).map(i => row(i, if (i % 5 == 0) null else 1.0)))
    assert(Stats.bootstrapMeanCI(withNulls, "v", "id").head()
      .getLong(0) == 40L)
    intercept[IllegalArgumentException] {
      Stats.bootstrapMeanCI(df, "v", "id", nBoot = 5)
    }
    intercept[IllegalArgumentException] {
      Stats.bootstrapMeanCI(df, "v", "id", alpha = 0.8)
    }
  }

  test("giniIndex: uniform 0, single-holder (n-1)/n, NULL skip, loud negatives") {
    val uniform = table("id bigint, x bigint",
      (1L to 10L).map(i => row(i, 7L)))
    val u = Stats.giniIndex(uniform, "x", "id").head()
    assert(u.getLong(0) == 10L && u.getLong(1) == 70L &&
      u.getDouble(2) == 0.0, u.toString)
    // one holder of all mass among n=5: G = (n-1)/n = 0.8
    val single = table("id bigint, x bigint",
      Seq(row(1L, 0L), row(2L, 0L), row(3L, 0L), row(4L, 0L), row(5L, 100L)))
    assert(Stats.giniIndex(single, "x", "id").head().getDouble(2) == 0.8)
    // NULL mass rows are excluded from n and the sums
    val withNull = table("id bigint, x bigint",
      Seq(row(1L, 3L), row(2L, null), row(3L, 3L)))
    assert(Stats.giniIndex(withNull, "x", "id").head().getLong(0) == 2L)
    val neg = table("id bigint, x bigint", Seq(row(1L, -1L)))
    val e = intercept[Throwable] { Stats.giniIndex(neg, "x", "id").collect() }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("negative mass"), msgs.take(300))
    intercept[IllegalArgumentException] { // zero total mass: G undefined
      Stats.giniIndex(table("id bigint, x bigint", Seq(row(1L, 0L))),
        "x", "id")
    }
  }

  test("giniIndexByGroup == ungrouped giniIndex per filtered group; zero-mass NULL") {
    val df = table("g string, id bigint, x bigint",
      (1L to 60L).map(i => row(s"g${i % 3}", i, (i * i) % 17)) ++
        Seq(row("gz", 100L, 0L))) // a zero-total group
    val grouped = Stats.giniIndexByGroup(df, "g", "x", "id").collect()
    assert(grouped.map(_.getString(0)).toSeq == Seq("g0", "g1", "g2", "gz"))
    grouped.filter(_.getString(0) != "gz").foreach { r =>
      val solo = Stats.giniIndex(df.filter(col("g") === r.getString(0)),
        "x", "id").head()
      assert(r.toSeq.drop(1) == solo.toSeq, s"group ${r.getString(0)}")
    }
    // zero-mass group: NULL gini (0/0), not a crash — the documented
    // per-group divergence from the ungrouped loud failure
    val gz = grouped.find(_.getString(0) == "gz").get
    assert(gz.getLong(2) == 0L && gz.isNullAt(3), gz.toString)
  }

  test("giniFromCounts == giniIndex on random masses; fold == full recompute; loud guards") {
    import graft.operators.Profile
    // random masses with heavy ties (mod 13) — the grid path must agree
    // with the rank path exactly (tie-order-invariance of the identity)
    val df = table("id bigint, x bigint",
      (1L to 400L).map(i => row(i, (i * 31) % 13)))
    val rank = Stats.giniIndex(df, "x", "id").head()
    val counts = Profile.ksSideCounts(df, "x", "cnt")
    val fromCounts = Stats.giniFromCounts(counts).head()
    assert(fromCounts.toSeq == rank.toSeq,
      s"counts path $fromCounts != rank path $rank")
    // the incremental fold (base + delta counts) reads the same G
    val base = Profile.ksSideCounts(df.filter(col("id") % 10 < 8), "x", "cnt")
    val delta = Profile.ksSideCounts(df.filter(col("id") % 10 >= 8), "x", "cnt")
    val folded = Stats.giniFromCounts(
      Profile.foldValueCounts(base, delta)).head()
    assert(folded.toSeq == rank.toSeq, s"fold $folded != batch $rank")
    // loud guards: fractional mass, negative mass, non-positive count,
    // zero total, empty state
    def loud(v: Any, cnt: Any, needle: String): Unit = {
      val e = intercept[Throwable] {
        Stats.giniFromCounts(table("v double, cnt bigint",
          Seq(row(v, cnt)))).collect()
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains(needle), s"$v/$cnt: ${msgs.take(300)}")
    }
    loud(1.5, 2L, "non-negative integer")
    loud(-1.0, 2L, "non-negative integer")
    loud(1.0, 0L, "non-positive count")
    intercept[IllegalArgumentException] {
      Stats.giniFromCounts(table("v double, cnt bigint", Seq(row(0.0, 3L))))
    }
    intercept[IllegalArgumentException] {
      Stats.giniFromCounts(table("v double, cnt bigint", Seq.empty))
    }
  }

  test("giniByGroupFromCounts == giniIndexByGroup; fold == batch; zero-total NULL") {
    import graft.operators.Profile
    val df = table("g string, id bigint, x bigint",
      (1L to 90L).map(i => row(s"g${i % 3}", i, (i * i) % 17)) ++
        Seq(row("gz", 100L, 0L), row(null, 101L, 5L))) // zero-total + NULL group
    val rank = Stats.giniIndexByGroup(df, "g", "x", "id")
      .collect().map(_.toSeq)
    val counts = Profile.groupSideCounts(df, "g", "x")
    val fromCounts = Stats.giniByGroupFromCounts(counts, "g")
      .collect().map(_.toSeq)
    assert(fromCounts.toSeq == rank.toSeq,
      s"counts ${fromCounts.toSeq} != rank ${rank.toSeq}")
    val base = Profile.groupSideCounts(df.filter(col("id") % 2 === 0), "g", "x")
    val delta = Profile.groupSideCounts(df.filter(col("id") % 2 === 1), "g", "x")
    val folded = Stats.giniByGroupFromCounts(
      Profile.foldGroupValueCounts(base, delta), "g").collect().map(_.toSeq)
    assert(folded.toSeq == rank.toSeq)
    // loud guards ride the shared expressions
    val e = intercept[Throwable] {
      Stats.giniByGroupFromCounts(table("__g string, v double, cnt bigint",
        Seq(row("a", 1.5, 2L))), "g").collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("non-negative integer"), msgs.take(300))
  }

  test("bootstrapMeanCI: one-scan fold == explode reference, bit-for-bit") {
    // values with many decimal digits + negatives + a skewed partition
    // layout: the exact shapes where a float fold would drift and an
    // exact-decimal fold must not
    val rnd = new scala.util.Random(47)
    val df = table("id bigint, v double",
      (0L until 500L).map(i =>
        row(i, (rnd.nextGaussian() * 1e3 + 1.0 / (i + 3)) *
          (if (i % 7 == 0) -1 else 1))))
      .repartition(11)
    val fold = Stats.bootstrapMeanCI(df, "v", "id", nBoot = 40,
      alpha = 0.1, salt = "eq").head().toSeq
    val explode = Stats.bootstrapMeanCIExplode(df, "v", "id", nBoot = 40,
      alpha = 0.1, salt = "eq").head().toSeq
    assert(fold == explode, s"fold=$fold explode=$explode")
    // and the fold is partition-layout-invariant (exact partials)
    assert(Stats.bootstrapMeanCI(df.repartition(2), "v", "id", nBoot = 40,
      alpha = 0.1, salt = "eq").head().toSeq == fold)
    // NULL ids: the explode shape's NULL hash falls through the
    // when-chain to weight 6 — the fold must reproduce that, not NPE
    val withNullIds = table("id string, v double",
      (0 until 40).map(i =>
        row(if (i % 4 == 0) null else s"k$i", 3.0 + i * 0.25)))
    val fNull = Stats.bootstrapMeanCI(withNullIds, "v", "id", nBoot = 20,
      salt = "nid").head().toSeq
    val eNull = Stats.bootstrapMeanCIExplode(withNullIds, "v", "id",
      nBoot = 20, salt = "nid").head().toSeq
    assert(fNull == eNull, s"fold=$fNull explode=$eNull")
  }

  test("bootstrapMeanCIByGroup == ungrouped bootstrapMeanCI per filtered group") {
    val rnd = new scala.util.Random(53)
    val df = table("id bigint, g string, v double",
      (0L until 300L).map(i =>
        row(i, s"g${i % 3}", rnd.nextDouble() * 100.0 - 20.0)))
    val grouped = Stats.bootstrapMeanCIByGroup(df, "g", "v", "id",
      nBoot = 30, salt = "pg").collect()
    assert(grouped.map(_.getString(0)).toSeq == Seq("g0", "g1", "g2"))
    grouped.foreach { r =>
      val solo = Stats.bootstrapMeanCI(df.filter(col("g") === r.getString(0)),
        "v", "id", nBoot = 30, salt = "pg").head()
      assert(r.toSeq.drop(1) == solo.toSeq, s"group ${r.getString(0)}")
    }
    // NULL group is its own stratum (string-cast NULL stays NULL)
    val withNullGroup = table("id bigint, g string, v double",
      Seq(row(1L, null, 5.0), row(2L, "a", 7.0), row(3L, "a", 9.0)))
    val g2 = Stats.bootstrapMeanCIByGroup(withNullGroup, "g", "v", "id",
      nBoot = 30, salt = "pg").collect()
    assert(g2.length == 2 && g2.exists(_.isNullAt(0)), g2.mkString("; "))
  }

  test("rankNormalize largeGroups path == window path (one-flag-two-modes)") {
    // skewed groups + value ties + NULLs: the exact shapes where the
    // two physical plans could diverge if the total orders differed
    val rnd = new scala.util.Random(17)
    val df = table("id bigint, g string, v double",
      (0L until 120L).map { i =>
        val g = if (i % 8 == 0) "small" else "big" // 7:1 skew
        val v: Any = if (i % 17 == 0) null else rnd.nextInt(10).toDouble
        row(i, g, v)
      }).repartition(9)
    def run(large: Boolean) =
      Stats.rankNormalize(df, Seq("g"), "v", "id", "pct",
          largeGroups = large)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).sortBy(_._1).toSeq
    assert(run(large = true) == run(large = false))
  }

  test("topPaths: ordered truncated paths, tie-broken cutoff, oversize guard") {
    val df = table("u bigint, sid bigint, t_us bigint, eid bigint, et string", Seq(
      row(1L, 1L, 10L, 1L, "view"), row(1L, 1L, 20L, 2L, "click"),
      row(1L, 2L, 10L, 3L, "view"), row(1L, 2L, 20L, 4L, "click"),
      row(2L, 1L, 10L, 5L, "view"), row(2L, 1L, 10L, 6L, "click"), // equal ts:
                                                                   //  eid orders
      row(3L, 1L, 1L, 7L, "a"), row(3L, 1L, 2L, 8L, "b"),
      row(3L, 1L, 3L, 9L, "c"), row(3L, 1L, 4L, 10L, "d")))       // truncated at 3
    val got = Events.topPaths(df, Seq("u", "sid"), "t_us", "et",
        k = 2, maxLen = 3, tieBreak = Seq("eid"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "view>click" appears twice (u1 sessions); u2's equal-ts session
    // also reads view>click via the eid tie -> count 3; u3 truncates
    // "a>b>c>d" to "a>b>c" (count 1) and falls below k=2's cutoff
    assert(got == Seq(("view>click", 3L), ("a>b>c", 1L)), got.toString)
    val e = intercept[Exception] {
      Events.topPaths(df, Seq("u", "sid"), "t_us", "et",
        k = 2, maxLen = 3, maxEventsPerGroup = 3).collect()
    }
    assert(e.getMessage.contains("exceeds 3"), e.getMessage)
  }

  test("resampleFfill: gaps filled per key, last-in-step wins by tie, span guard raises") {
    def ev(rows: Seq[(Long, Long, Long, Double)]) =
      table("u bigint, t_us bigint, eid bigint, v double",
          rows.map { case (u, t, e, v) => row(u, t, e, v) })
        .select(col("u"), timestamp_micros(col("t_us")).as("ts"),
          col("eid"), col("v"))
    // step=10: user 1 observes steps 0 (two events, later eid wins at
    // equal ts), 3 — steps 1-2 carry step 0's value; user 2 is a
    // single-step key
    val df = ev(Seq(
      (1L, 5L, 1L, 10.0), (1L, 5L, 2L, 20.0),   // equal ts: eid 2 wins
      (1L, 31L, 3L, 7.0),
      (2L, 100L, 4L, 1.5)))
    val got = Events.resampleFfill(df, "u", "ts", "v", stepUs = 10L,
        tieBreak = Seq("eid"))
      .orderBy("u", "step_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      (1L, 0L, 20.0, true), (1L, 10L, 20.0, false),
      (1L, 20L, 20.0, false), (1L, 30L, 7.0, true),
      (2L, 100L, 1.5, true)), got.toString)
    // a key spanning more steps than allowed fails loudly
    val e = intercept[Exception] {
      Events.resampleFfill(ev(Seq((1L, 0L, 1L, 1.0), (1L, 1000L, 2L, 2.0))),
        "u", "ts", "v", stepUs = 10L, maxStepsPerKey = 50L).collect()
    }
    assert(e.getMessage.contains("spans more than 50"), e.getMessage)
  }

  test("transitionMatrix: hand-computed counts, sentinels, rows sum to 1") {
    // group 1: A B A   group 2: A B   (same user, two sessions)
    val df = table("u bigint, sid bigint, t_us bigint, et string", Seq(
      row(1L, 1L, 10L, "A"), row(1L, 1L, 20L, "B"), row(1L, 1L, 30L, "A"),
      row(1L, 2L, 40L, "A"), row(1L, 2L, 50L, "B")))
    val got = Events.transitionMatrix(df, Seq("u", "sid"), "t_us", "et")
      .orderBy("from_state", "to_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // transitions: A->B x2, B->A x1; starts: ->A x2; ends: A->END, B->END
    assert(got == Seq(
      ("A", "B", 2L, 2.0 / 3),
      ("A", "__END__", 1L, 1.0 / 3),
      ("B", "A", 1L, 0.5),
      ("B", "__END__", 1L, 0.5),
      ("__START__", "A", 2L, 1.0)), got.toString)
    // every from-state's outgoing probabilities sum to exactly 1
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    }
  }

  test("transitionMatrix: tieBreak disambiguates equal timestamps; single-event group") {
    val df = table("g bigint, t_us bigint, seq bigint, et string", Seq(
      row(1L, 10L, 2L, "Y"), row(1L, 10L, 1L, "X"), // same ts: X then Y
      row(2L, 99L, 1L, "Z")))                        // lone event
    val got = Events.transitionMatrix(df, Seq("g"), "t_us", "et",
        tieBreak = Seq("seq"))
      .orderBy("from_state", "to_state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("X", "Y", 1L),
      ("Y", "__END__", 1L),
      ("Z", "__END__", 1L),
      ("__START__", "X", 1L),
      ("__START__", "Z", 1L)), got.toString)
  }
}
