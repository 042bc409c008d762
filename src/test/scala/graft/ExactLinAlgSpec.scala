package graft

import java.math.{BigDecimal => JBD}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExactLinAlg
import graft.operators.{Classify, Events}
import graft.testkit.SparkTestKit._

/** The shared fraction-free Bareiss determinant/adjugate
  * (SURVEY.md §2.8) and its two callers at the TOP of their allowed
  * parameter ranges — the sizes the round-18 minor expansion could
  * never reach (O(m!) would hang the driver past m ≈ 10; Bareiss is
  * O(m³) per determinant, so the full range completes in seconds). */
class ExactLinAlgSpec extends AnyFunSuite {

  private def jbd(x: Double): JBD =
    new JBD(x).setScale(12, java.math.RoundingMode.HALF_UP)
  private def mx(rows: Seq[Seq[Double]]): Vector[Vector[JBD]] =
    rows.map(_.map(jbd).toVector).toVector

  test("det12: sizes 0/1/2 are the literal minor values") {
    assert(ExactLinAlg.det12(Vector.empty).get == JBD.ONE)
    assert(ExactLinAlg.det12(mx(Seq(Seq(7.5)))).get == jbd(7.5))
    // 2x2 must be EXACTLY mul12(a,d) - mul12(b,c): the k<=3 readouts
    // (q371/q372) rely on bit-identity with the round-18 values
    val d2 = ExactLinAlg.det12(mx(Seq(Seq(1.25, 2.0), Seq(3.0, 4.5)))).get
    assert(d2 == ExactLinAlg.mul12(jbd(1.25), jbd(4.5))
      .subtract(ExactLinAlg.mul12(jbd(2.0), jbd(3.0))))
    assert(d2.doubleValue == 1.25 * 4.5 - 2.0 * 3.0)
  }

  test("det12: integer 3x3 is exact (Bareiss divisions divide evenly)") {
    // [[2,1,1],[1,3,2],[1,0,0]] -> det = -1 (hand Bareiss: step-0
    // entries 5,3,-1,-1; final (5*(-1) - (-1)*3)/2 = -1)
    val d = ExactLinAlg.det12(
      mx(Seq(Seq(2, 1, 1), Seq(1, 3, 2), Seq(1, 0, 0)).map(_.map(_.toDouble))))
    assert(d.get.doubleValue == -1.0)
  }

  test("det12: zero leading pivot reads None (fixed pivot order, loud)") {
    // true det is -1, but the FIXED no-pivoting order hits a(0)(0)=0;
    // the documented contract is None -> callers' singularity path
    val d = ExactLinAlg.det12(
      mx(Seq(Seq(0, 1, 0), Seq(1, 0, 0), Seq(0, 0, 1)).map(_.map(_.toDouble))))
    assert(d.isEmpty)
  }

  test("cofactor12 matches the signed minor determinant") {
    val a = mx(Seq(Seq(4, 1, 2), Seq(1, 5, 3), Seq(2, 3, 6))
      .map(_.map(_.toDouble)))
    // C(0,1) = -det [[1,3],[2,6]] = -(6-6) = 0; C(1,2) = -det[[4,1],[2,3]]
    assert(ExactLinAlg.cofactor12(a, 0, 1).doubleValue == 0.0)
    assert(ExactLinAlg.cofactor12(a, 1, 2).doubleValue == -(4.0 * 3 - 1 * 2))
  }

  test("det12 + full adjugate at 15x15 (the largest caller size) in seconds") {
    // deterministic PD matrix: A = B^T B + 15 I over small integers —
    // exactly the shape (covariance / Hessian) the callers solve
    val n = 15
    val b = Array.tabulate(n, n)((i, j) => ((i * 7 + j * 11) % 13 - 6).toDouble)
    val a = mx(Seq.tabulate(n, n)((i, j) =>
      (0 until n).map(k => b(k)(i) * b(k)(j)).sum +
        (if (i == j) n.toDouble else 0.0)))
    val t0 = System.nanoTime()
    val det = ExactLinAlg.det12(a)
    val adj = for (i <- 0 until n; j <- 0 until n)
      yield ExactLinAlg.cofactor12(a, i, j)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(det.exists(_.signum > 0), s"PD det must be positive: $det")
    assert(adj.size == n * n)
    assert(secs < 30.0, f"15x15 det + 225 cofactors took $secs%.1f s")
    // sanity vs double LU elimination: same value to ~1e-9 relative
    val lu = Array.tabulate(n, n)((i, j) => a(i)(j).doubleValue)
    var dd = 1.0
    for (k <- 0 until n) {
      dd *= lu(k)(k)
      for (i <- k + 1 until n) {
        val f = lu(i)(k) / lu(k)(k)
        for (j <- k until n) lu(i)(j) -= f * lu(k)(j)
      }
    }
    val rel = math.abs(det.get.doubleValue - dd) / math.abs(dd)
    assert(rel < 1e-9, s"Bareiss ${det.get.doubleValue} vs LU $dd")
  }

  test("logRankTestK at maxGroups = 16: completes in seconds, df = 15") {
    val rows = for {
      g <- 0 until 16
      j <- 0 until 12
    } yield row(f"g$g%02d",
      ((g * 7 + j * 5) % 29 + 1).toDouble + 0.5 * (j % 3),
      (g + j) % 4 != 0)
    val df = table("g string, dur double, obs boolean", rows)
    val t0 = System.nanoTime()
    val got = Events.logRankTestK(df, "g", "dur", "obs", maxGroups = 16)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.length == 16)
    assert(got.forall(_.getLong(7) == 15L), "df = k-1 = 15")
    val chi2 = got.head.get(6)
    assert(chi2 != null && got.head.getDouble(6) >= 0.0,
      s"16-group covariance should be invertible here, chi2 = $chi2")
    assert(secs < 60.0, f"16-group log-rank took $secs%.1f s")
  }

  test("trainLogistic at 8 features (raised cap): converges, seconds") {
    // 8 linearly-independent deterministic features; label from a
    // fixed linear rule -> a well-conditioned 9x9 Hessian
    val rows = (0 until 240).map { i =>
      val x = (1 to 8).map(f => (((i * (f * 2 + 3)) % 23) - 11).toDouble / 4.0)
      val score = x.zipWithIndex.map { case (v, fi) =>
        v * (if (fi % 2 == 0) 1.0 else -0.5)
      }.sum
      row(x :+ Boolean.box(score + (i % 5 - 2) * 0.3 > 0.0): _*)
    }
    val df = table(
      (1 to 8).map(f => s"x$f double").mkString(", ") + ", y boolean", rows)
    val t0 = System.nanoTime()
    val m = Classify.trainLogistic(
      df, (1 to 8).map(f => s"x$f"), "y", iters = 3, maxFeatures = 8)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(m.beta.size == 9)
    assert(m.beta.drop(1).exists(_ != 0.0), "slope must move off zero")
    assert(secs < 60.0, f"8-feature logistic took $secs%.1f s")
    // the absolute cap is loud
    assert(intercept[IllegalArgumentException] {
      Classify.trainLogistic(df, Seq("x1"), "y", maxFeatures = 20)
    }.getMessage.contains("[1, 16]"))
  }
}
