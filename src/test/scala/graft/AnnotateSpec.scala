package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Annotate
import graft.testkit.SparkTestKit._

/** Annotation-quality contracts: hand-computed Fleiss' kappa and
  * Krippendorff's alpha, consolidation tie rules, the annotator
  * report's flag semantics, and the loud validation surface.
  * (q253–q256 check the full five-rater panel against DuckDB; this
  * pins the arithmetic on hand cases.) */
class AnnotateSpec extends AnyFunSuite {

  private def ratings(rows: Seq[(String, String, String)]) =
    table("it string, r string, l string",
      rows.map(t => row(t._1, t._2, t._3)))

  test("fleissKappa: hand-computed 3x3 panel") {
    // i1: aaa, i2: aab, i3: bbb — A=23, B=41, kappa = 44/80 = 0.55
    val df = ratings(Seq(
      ("i1", "r1", "a"), ("i1", "r2", "a"), ("i1", "r3", "a"),
      ("i2", "r1", "a"), ("i2", "r2", "a"), ("i2", "r3", "b"),
      ("i3", "r1", "b"), ("i3", "r2", "b"), ("i3", "r3", "b")))
    val got = Annotate.fleissKappa(df, "it", "r", "l").head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 3L &&
      got.getLong(2) == 2L)
    assert(got.getDouble(3) == 0.55)
  }

  test("fleissKappa: perfect agreement is 1; constant panel is NULL") {
    val perfect = ratings(Seq(
      ("i1", "r1", "a"), ("i1", "r2", "a"),
      ("i2", "r1", "b"), ("i2", "r2", "b")))
    assert(Annotate.fleissKappa(perfect, "it", "r", "l")
      .head().getDouble(3) == 1.0)
    // every rater always says "x": P_e = 1, kappa undefined
    val constant = ratings(Seq(
      ("i1", "r1", "x"), ("i1", "r2", "x"),
      ("i2", "r1", "x"), ("i2", "r2", "x")))
    assert(Annotate.fleissKappa(constant, "it", "r", "l").head().isNullAt(3))
  }

  test("fleissKappa: varying panel, <2 raters, and duplicates are loud") {
    val varying = ratings(Seq(
      ("i1", "r1", "a"), ("i1", "r2", "a"), ("i2", "r1", "a")))
    val e1 = intercept[IllegalArgumentException] {
      Annotate.fleissKappa(varying, "it", "r", "l").head()
    }
    assert(e1.getMessage.contains("krippendorffAlpha"))
    val single = ratings(Seq(("i1", "r1", "a"), ("i2", "r1", "b")))
    val e2 = intercept[IllegalArgumentException] {
      Annotate.fleissKappa(single, "it", "r", "l").head()
    }
    assert(e2.getMessage.contains("at least 2"))
    val dup = ratings(Seq(
      ("i1", "r1", "a"), ("i1", "r1", "b"),
      ("i1", "r2", "a"), ("i2", "r1", "a"), ("i2", "r2", "a")))
    val e3 = intercept[Exception] {
      Annotate.fleissKappa(dup, "it", "r", "l").head()
    }
    assert(e3.getMessage.contains("one rating per"))
  }

  test("krippendorffAlpha: hand-computed varying-participation case") {
    // i1: aa (n=2), i2: abb (n=3), i3: c alone (dropped)
    // S=4 over lcm 2, C=12, alpha = 1 - 4*4/(2*12) = 1/3
    val df = ratings(Seq(
      ("i1", "r1", "a"), ("i1", "r2", "a"),
      ("i2", "r1", "a"), ("i2", "r2", "b"), ("i2", "r3", "b"),
      ("i3", "r1", "c")))
    val got = Annotate.krippendorffAlpha(df, "it", "r", "l").head()
    assert(got.getLong(0) == 2L, "pairable items")
    assert(got.getLong(1) == 5L, "pairable ratings")
    assert(got.getLong(2) == 2L, "labels over pairable items only")
    assert(got.getDouble(3) == 0.333333)
  }

  test("krippendorffAlpha: perfect agreement 1, single label NULL, loud guards") {
    val perfect = ratings(Seq(
      ("i1", "r1", "a"), ("i1", "r2", "a"),
      ("i2", "r1", "b"), ("i2", "r2", "b"), ("i2", "r3", "b")))
    assert(Annotate.krippendorffAlpha(perfect, "it", "r", "l")
      .head().getDouble(3) == 1.0)
    val mono = ratings(Seq(
      ("i1", "r1", "x"), ("i1", "r2", "x"),
      ("i2", "r1", "x"), ("i2", "r2", "x")))
    assert(Annotate.krippendorffAlpha(mono, "it", "r", "l")
      .head().isNullAt(3))
    val lonely = ratings(Seq(("i1", "r1", "a"), ("i2", "r2", "b")))
    val e = intercept[IllegalArgumentException] {
      Annotate.krippendorffAlpha(lonely, "it", "r", "l").head()
    }
    assert(e.getMessage.contains("no item has 2+"))
  }

  test("consolidateLabels: majority, lexicographic ties, confidence") {
    val df = ratings(Seq(
      ("i1", "r1", "a"), ("i1", "r2", "a"), ("i1", "r3", "b"),
      ("i2", "r1", "b"), ("i2", "r2", "a"))) // tie -> "a"
    val got = Annotate.consolidateLabels(df, "it", "r", "l")
      .orderBy("it").collect()
    assert(got(0).toSeq == Seq("i1", "a", 3L, 2L, 0.666667))
    assert(got(1).toSeq == Seq("i2", "a", 2L, 1L, 0.5))
  }

  test("annotatorReport: agreement rates, flag on the Wilson upper bound") {
    // r1/r2 always form the consensus; r3 agrees once in four
    val df = ratings((1 to 4).flatMap { i =>
      val l3 = if (i == 1) "a" else s"junk$i"
      Seq((s"i$i", "r1", "a"), (s"i$i", "r2", "a"), (s"i$i", "r3", l3))
    })
    val got = Annotate.annotatorReport(df, "it", "r", "l",
      flagBelow = 0.7).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("r1", "r2", "r3"))
    assert(got(0).getLong(1) == 4L && got(0).getLong(2) == 4L)
    assert(got(0).getDouble(3) == 1.0 && !got(0).getBoolean(6))
    assert(got(2).getLong(2) == 1L && got(2).getDouble(3) == 0.25)
    // Wilson upper bound at 1/4 is ~0.699 < 0.7 -> flagged
    assert(got(2).getDouble(5) < 0.7 && got(2).getBoolean(6))
  }

  // hand case: A rated 1,2; B rated 1,1; C rated 2,4,4
  private def metricRatings = table("it string, r string, l int", Seq(
    row("A", "r1", 1), row("A", "r2", 2),
    row("B", "r1", 1), row("B", "r2", 1),
    row("C", "r1", 2), row("C", "r2", 4), row("C", "r3", 4)))

  test("krippendorffAlphaMetric: hand-computed interval case") {
    // S_o: A: 2*5-9=1; B: 0; C: (3*36-100)/2=4 -> 5
    // S_e: 7*43 - 15^2 = 76; alpha = 1 - 6*5/76 = 0.605263
    val got = Annotate.krippendorffAlphaMetric(
      metricRatings, "it", "r", "l", "interval").head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 7L &&
      got.getLong(2) == 3L && got.getString(3) == "interval")
    assert(got.getDouble(4) == 0.605263)
  }

  test("krippendorffAlphaMetric: hand-computed linear case") {
    // S_o: A: 1; B: 0; C: 4/2=2 -> 3
    // S_e: pairs (1,2):6 (1,4):18 (2,4):8 -> 32; alpha = 1 - 18/32
    val got = Annotate.krippendorffAlphaMetric(
      metricRatings, "it", "r", "l", "linear").head()
    assert(got.getString(3) == "linear")
    assert(got.getDouble(4) == 0.4375)
  }

  test("krippendorffAlphaMetric: 0/1 levels reduce to the nominal alpha") {
    val df = table("it string, r string, l int", Seq(
      row("A", "r1", 0), row("A", "r2", 0), row("A", "r3", 1),
      row("B", "r1", 1), row("B", "r2", 1),
      row("C", "r1", 0), row("C", "r2", 1),
      row("D", "r1", 0), row("D", "r2", 0)))
    val nominal = Annotate.krippendorffAlpha(df, "it", "r", "l")
      .head().getDouble(3)
    Seq("interval", "linear").foreach { m =>
      val a = Annotate.krippendorffAlphaMetric(df, "it", "r", "l", m)
        .head().getDouble(4)
      assert(a == nominal, s"metric $m must equal nominal on 0/1 levels")
    }
  }

  test("krippendorffAlphaMetric: degenerate NULL, exclusions, loud guards") {
    // all ratings identical: D_e = 0 -> NULL alpha
    val same = table("it string, r string, l int", Seq(
      row("A", "r1", 3), row("A", "r2", 3), row("B", "r1", 3),
      row("B", "r2", 3)))
    assert(Annotate.krippendorffAlphaMetric(same, "it", "r", "l")
      .head().isNullAt(4))
    // single-rating items are excluded from every statistic
    val got = Annotate.krippendorffAlphaMetric(
      metricRatings.unionByName(table("it string, r string, l int",
        Seq(row("Z", "r1", 5)))), "it", "r", "l", "interval").head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 7L &&
      got.getDouble(4) == 0.605263)
    val e1 = intercept[IllegalArgumentException] {
      Annotate.krippendorffAlphaMetric(
        table("it string, r string, l string", Seq(row("A", "r1", "x"))),
        "it", "r", "l")
    }
    assert(e1.getMessage.contains("must be numeric"))
    val e2 = intercept[IllegalArgumentException] {
      Annotate.krippendorffAlphaMetric(metricRatings, "it", "r", "l",
        "ordinal-rank")
    }
    assert(e2.getMessage.contains("metric"))
    val e3 = intercept[IllegalArgumentException] {
      Annotate.krippendorffAlphaMetric(
        table("it string, r string, l int", Seq(row("A", "r1", 1))),
        "it", "r", "l").head()
    }
    assert(e3.getMessage.contains("no item has 2+"))
  }
}
