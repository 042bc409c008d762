package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Experiment
import graft.testkit.SparkTestKit._

class ExperimentSpec extends AnyFunSuite {

  test("assignArms: deterministic, salt-sensitive, weight-proportional, NULL keys") {
    val users = table("id bigint", (0L until 2000L).map(row(_)))
    val arms = Seq(("control", 0.5), ("treat", 0.5))
    def assign(salt: String) =
      Experiment.assignArms(users, "id", salt, arms)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a1 = assign("s1")
    // rerun-stable: the exact same assignment every time
    assert(assign("s1") == a1)
    // a new salt is a fresh coin: a meaningful fraction moves arms
    val a2 = assign("s2")
    val moved = a1.count { case (k, v) => a2(k) != v }
    assert(moved > 600 && moved < 1400, s"moved $moved of 2000")
    // weights hold within binomial noise (p=0.5, n=2000, sd~22)
    val nControl = a1.values.count(_ == "control")
    assert(math.abs(nControl - 1000) < 120, s"control got $nControl")
    // every key lands in exactly one arm; skewed weights skew counts
    val skew = Experiment.assignArms(users, "id", "s1",
        Seq(("a", 0.9), ("b", 0.1)))
      .groupBy("arm").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(skew.values.sum == 2000 && skew("a") > 1650, skew.toString)
    // NULL key -> NULL arm
    val n = Experiment.assignArms(
      table("id bigint", Seq(row(null.asInstanceOf[java.lang.Long]))),
      "id", "s1", arms).head()
    assert(n.isNullAt(1))
    intercept[IllegalArgumentException] {
      Experiment.assignArms(users, "id", "s1", Seq(("only", 1.0)))
    }
    intercept[IllegalArgumentException] {
      Experiment.assignArms(users, "id", "s1",
        Seq(("a", 0.5), ("a", 0.5)))
    }
  }

  test("abReport: hand-computed z against control, control NULL z, degenerate pool") {
    // control 50/100, treat 60/100: pool = 0.55,
    // se = sqrt(.55*.45*(2/100)) = 0.070356..., z = 0.1/se = 1.421338
    def armRows(arm: String, pass: Int, fail: Int) =
      Seq.fill(pass)(row(arm, true)) ++ Seq.fill(fail)(row(arm, false))
    val df = table("arm string, f boolean",
      armRows("control", 50, 50) ++ armRows("treat", 60, 40))
    val got = Experiment.abReport(df, "arm", "f", "control")
      .orderBy("arm").collect()
    val ctl = got(0); val trt = got(1)
    assert(ctl.isNullAt(6) && ctl.isNullAt(7)) // no self-comparison
    assert(trt.getDouble(6) == 1.421338, trt.toString)
    assert(!trt.getBoolean(7))
    // a clearly separated treatment IS significant
    val strong = table("arm string, f boolean",
      armRows("control", 30, 70) ++ armRows("treat", 70, 30))
    val sg = Experiment.abReport(strong, "arm", "f", "control")
      .filter(col("arm") === "treat").head()
    assert(sg.getBoolean(7), sg.toString)
    // degenerate pool (everyone converts everywhere): NULL z, no crash
    val flat = table("arm string, f boolean",
      armRows("control", 10, 0) ++ armRows("treat", 10, 0))
    assert(Experiment.abReport(flat, "arm", "f", "control")
      .filter(col("arm") === "treat").head().isNullAt(6))
    intercept[IllegalArgumentException] {
      Experiment.abReport(df, "arm", "f", "nope")
    }
  }

  test("stratifiedSample: exact k per stratum, deterministic, rank order") {
    val df = table("lang string, id bigint",
      (0L until 60L).map(i => row(if (i < 40) "en" else "fr", i)))
    val s1 = Experiment.stratifiedSample(df, Seq("lang"), "id", 5, "s1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(s1.count(_._1 == "en") == 5 && s1.count(_._1 == "fr") == 5)
    assert(s1.filter(_._1 == "en").map(_._3).sorted.toSeq == Seq(1L, 2, 3, 4, 5))
    // rerun = identical sample (pure function of salt and id)
    val s2 = Experiment.stratifiedSample(df, Seq("lang"), "id", 5, "s1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(s1.toSet == s2.toSet)
    // a different salt draws a genuinely different sample
    val s3 = Experiment.stratifiedSample(df, Seq("lang"), "id", 5, "s2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s3 != s1.map(t => (t._1, t._2)).toSet)
    // sample == the k smallest portable hashes, rank = that hash order
    def hash(salt: String, id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$salt:$id".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
    val expEn = (0L until 40L).map(i => (hash("s1", i), i)).sorted.take(5)
    assert(s1.filter(_._1 == "en").sortBy(_._3).map(_._2).toSeq ==
      expEn.map(_._2), "rank order must follow the hash order")
  }

  test("stratifiedSample: short stratum keeps all; unrelated churn is bounded") {
    val df = table("lang string, id bigint",
      (0L until 23L).map(i => row(if (i < 20) "en" else "fr", i)))
    val got = Experiment.stratifiedSample(df, Seq("lang"), "id", 5, "x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.count(_._1 == "fr") == 3) // fewer than k: keep all
    // adding one row changes AT MOST one survivor in its own stratum
    // and nothing in the other stratum
    val grown = table("lang string, id bigint",
      (0L until 23L).map(i => row(if (i < 20) "en" else "fr", i)) :+
        row("en", 99L))
    val got2 = Experiment.stratifiedSample(grown, Seq("lang"), "id", 5, "x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got2.filter(_._1 == "fr").toSet == got.filter(_._1 == "fr").toSet)
    val enDiff = got.filter(_._1 == "en").toSet
      .diff(got2.filter(_._1 == "en").toSet)
    assert(enDiff.size <= 1, s"unbounded churn: $enDiff")
    intercept[IllegalArgumentException] {
      Experiment.stratifiedSample(
        table("lang string, id bigint", Seq(row("en", null))),
        Seq("lang"), "id", 5, "x")
    }
  }

  test("cupedReport: correlated covariate strictly shrinks variance") {
    // y = 2x + arm effect + deterministic 'noise'; x varies within arm
    val rows = (0 until 40).map { i =>
      val arm = if (i % 2 == 0) "control" else "treat"
      val x = (i % 10).toDouble + 0.25 * (i % 3)
      val lift = if (arm == "treat") 1.5 else 0.0
      val y = 2.0 * x + lift + 0.1 * (i % 7)
      row(arm, x, y)
    }
    val df = table("arm string, x double, y double", rows)
    val got = Experiment.cupedReport(df, "arm", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("control", "treat"))
    Seq("control", "treat").foreach { a =>
      val r = got(a)
      val (vRaw, vAdj) = (r.getDouble(5), r.getDouble(6))
      assert(vAdj < vRaw,
        s"arm $a: adjusted variance $vAdj must shrink below raw $vRaw")
      // the CI stays a valid interval around the adjusted mean
      assert(r.getDouble(7) < r.getDouble(4) && r.getDouble(4) < r.getDouble(8))
    }
    // theta recovers the true slope within the noise scale
    assert(math.abs(got("control").getDouble(2) - 2.0) < 0.1)
    // the adjusted lift is still the true lift (means shift together)
    val liftAdj = got("treat").getDouble(4) - got("control").getDouble(4)
    assert(math.abs(liftAdj - 1.5) < 0.2)
  }

  test("cupedReport: exactly-uncorrelated covariate changes nothing") {
    // cov(x, y) = 0 by construction: the 2x2 balanced design
    val rows = Seq(
      row("a", 0.0, 0.0), row("a", 0.0, 1.0),
      row("a", 1.0, 0.0), row("a", 1.0, 1.0),
      row("b", 0.0, 2.0), row("b", 0.0, 3.0),
      row("b", 1.0, 2.0), row("b", 1.0, 3.0))
    val df = table("arm string, x double, y double", rows)
    val got = Experiment.cupedReport(df, "arm", "y", "x").collect()
    got.foreach { r =>
      assert(r.getDouble(2) == 0.0, "theta must be exactly 0")
      assert(r.getDouble(3) == r.getDouble(4), "mean unchanged")
      assert(r.getDouble(5) == r.getDouble(6), "variance unchanged")
    }
  }

  test("cupedReport: zero-variance covariate falls back to theta 0; edges") {
    val df = table("arm string, x double, y double", Seq(
      row("a", 5.0, 1.0), row("a", 5.0, 3.0), row("b", 5.0, 2.0)))
    val got = Experiment.cupedReport(df, "arm", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDouble(2) == 0.0)
    assert(got("a").getDouble(3) == got("a").getDouble(4))
    // single-unit arm: mean reads, variance and CI are NULL
    assert(got("b").getLong(1) == 1L && got("b").getDouble(4) == 2.0)
    assert(got("b").isNullAt(5) && got("b").isNullAt(6) &&
      got("b").isNullAt(7) && got("b").isNullAt(8))
    // incomplete rows (NULL arm/covariate/outcome) are excluded
    val holes = table("arm string, x double, y double", Seq(
      row("a", 1.0, 1.0), row("a", 2.0, 2.0),
      row(null, 3.0, 3.0), row("a", null, 4.0), row("a", 5.0, null)))
    assert(Experiment.cupedReport(holes, "arm", "y", "x")
      .head().getLong(1) == 2L)
    val e = intercept[IllegalArgumentException] {
      Experiment.cupedReport(
        table("arm string, x double, y double", Seq(row("a", 1.0, 1.0))),
        "arm", "y", "x").head()
    }
    assert(e.getMessage.contains(">= 2"))
  }

  test("sequentialAbReport: hand-computed mSPRT p, null reads 1, edges") {
    def armRows(arm: String, pass: Int, fail: Int) =
      Seq.fill(pass)(row(arm, true)) ++ Seq.fill(fail)(row(arm, false))
    // control 50/100, treat 70/100: a real effect
    val df = table("arm string, f boolean",
      armRows("control", 50, 50) ++ armRows("treat", 70, 30))
    val got = Experiment.sequentialAbReport(df, "arm", "f", "control")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("control").isNullAt(4) && got("control").isNullAt(5))
    // replay the documented closed form
    val (tau2, pool) = (0.1 * 0.1, 120.0 / 200.0)
    val v = pool * (1.0 - pool) * (1.0 / 100.0 + 1.0 / 100.0)
    val th = 0.7 - 0.5
    val expect = BigDecimal(math.min(1.0, math.sqrt((v + tau2) / v) *
        math.exp(-(th * th) * tau2 / (2.0 * v * (v + tau2)))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("treat").getDouble(4) == expect)
    assert(got("treat").getBoolean(5) == (expect <= 0.05))
    // identical arms: theta 0 -> the likelihood ratio favors the
    // null, p pins to exactly 1 and never signals
    val same = table("arm string, f boolean",
      armRows("control", 40, 60) ++ armRows("treat", 40, 60))
    val nullRow = Experiment.sequentialAbReport(same, "arm", "f", "control")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(nullRow("treat").getDouble(4) == 1.0)
    assert(!nullRow("treat").getBoolean(5))
    // degenerate pool (all-true outcomes): V = 0 -> NULL p
    val degen = table("arm string, f boolean",
      armRows("control", 10, 0) ++ armRows("treat", 10, 0))
    val degenRows = Experiment.sequentialAbReport(degen, "arm", "f", "control")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(degenRows("treat").isNullAt(4))
    intercept[IllegalArgumentException] {
      Experiment.sequentialAbReport(df, "arm", "f", "missing").collect()
    }
  }

  test("cupedReportByGroup: grouped equals filtered-ungrouped per slice") {
    // two slices with DIFFERENT true slopes, so pooled theta would be
    // wrong for both and the per-slice theta is load-bearing
    val rows = (0 until 60).map { i =>
      val g = if (i % 3 == 0) "en" else "de"
      val arm = if (i % 2 == 0) "control" else "treat"
      val x = (i % 10).toDouble + 0.5 * (i % 4)
      val slope = if (g == "en") 2.0 else -1.0
      val lift = if (arm == "treat") 1.0 else 0.0
      row(g, arm, x, slope * x + lift + 0.1 * (i % 7))
    }
    val df = table("g string, arm string, x double, y double", rows)
    val grouped = Experiment.cupedReportByGroup(df, "g", "arm", "y", "x")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    Seq("en", "de").foreach { g =>
      val solo = Experiment.cupedReport(
          df.filter(col("g") === g), "arm", "y", "x")
        .collect().map(r => r.getString(0) -> r).toMap
      solo.foreach { case (arm, s) =>
        val r = grouped((g, arm))
        // (n, theta6, mean_raw6, mean_adj6, var_raw6, var_adj6, lo6, hi6)
        assert(r.getLong(2) == s.getLong(1), s"$g/$arm n")
        (3 to 9).foreach { i =>
          assert(r.getDouble(i) == s.getDouble(i - 1), s"$g/$arm col $i")
        }
      }
    }
    // per-slice theta recovered each slice's own slope
    assert(math.abs(grouped(("en", "control")).getDouble(3) - 2.0) < 0.15)
    assert(math.abs(grouped(("de", "control")).getDouble(3) + 1.0) < 0.15)
  }

  test("cupedReportByGroup: zero-variance slice theta 0; NULL group kept") {
    val df = table("g string, arm string, x double, y double", Seq(
      // slice 'flat': constant covariate -> theta 0, adjusted == raw
      row("flat", "a", 5.0, 1.0), row("flat", "a", 5.0, 3.0),
      row("flat", "b", 5.0, 2.0), row("flat", "b", 5.0, 4.0),
      // NULL slice is its own group (null-safe join must keep it)
      row(null, "a", 1.0, 1.0), row(null, "a", 2.0, 3.0)))
    val got = Experiment.cupedReportByGroup(df, "g", "arm", "y", "x")
      .collect()
    val flat = got.filter(r => !r.isNullAt(0) && r.getString(0) == "flat")
    assert(flat.length == 2)
    flat.foreach { r =>
      assert(r.getDouble(3) == 0.0, "theta must be exactly 0")
      assert(r.getDouble(4) == r.getDouble(5), "mean unchanged")
    }
    val nullG = got.filter(_.isNullAt(0))
    assert(nullG.length == 1 && nullG(0).getLong(2) == 2L,
      s"NULL group must survive the join: ${got.mkString("; ")}")
    // theta of the NULL slice: x 1->1, 2->3 is slope 2
    assert(nullG(0).getDouble(3) == 2.0)
  }

  test("cupedAdjust composes: y_adj matches the report's arithmetic") {
    val rows = (0 until 12).map { i =>
      row(if (i % 2 == 0) "a" else "b",
        (i % 4).toDouble, 3.0 * (i % 4) + (i % 5))
    }
    val df = table("arm string, x double, y double", rows)
    val adj = Experiment.cupedAdjust(df, "arm", "y", "x")
    assert(adj.columns.contains("y_adj"))
    // per-arm mean of y_adj equals cupedReport's mean_adj6
    val means = adj.groupBy("arm")
      .agg(round(sum(round(col("y_adj"), 12).cast("decimal(38,12)"))
        .cast("double") / count(lit(1)), 6).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Experiment.cupedReport(df, "arm", "y", "x").collect().foreach { r =>
      assert(means(r.getString(0)) == r.getDouble(4))
    }
  }
}
