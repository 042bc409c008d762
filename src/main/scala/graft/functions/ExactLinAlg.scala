package graft.functions

import java.math.{BigDecimal => JBD, RoundingMode}

/** Deterministic fixed-point exact-decimal linear algebra shared by
  * the driver-side readouts that must hash-match a SQL oracle
  * digit-for-digit ([[graft.operators.Events.logRankTestK]]'s χ²
  * quadratic form, [[graft.operators.Classify.trainLogistic]]'s
  * Newton step).
  *
  * The house matrix discipline (see `/root/reference` has no linear
  * algebra — this is the extension surface's own convention,
  * established round 18 and hardened here):
  *
  *  - every PRODUCT is rounded to 12 decimal places immediately
  *    (`mul12`), so the value is a pure function of operation order,
  *    replayable by any engine with 38-digit decimals;
  *  - every DIVISION goes through IEEE-754 doubles
  *    (`a.doubleValue / b.doubleValue`) and is rounded back to 12dp —
  *    the proven cross-engine step (`CAST(x AS DOUBLE)` + `ROUND(_,
  *    12)` in the oracle), since decimal-division rounding rules are
  *    NOT portable across engines while double division is exact by
  *    IEEE;
  *  - determinants use FRACTION-FREE BAREISS ELIMINATION with a fixed
  *    (no-pivoting) order — O(n³), replacing the round-18 first-row
  *    minor expansion whose O(n!) cost made large `maxGroups` /
  *    `maxFeatures` values a silent driver hang. Sizes ≤ 2 are
  *    special-cased to the minor-expansion values
  *    (`mul12(a,d) − mul12(b,c)`), which Bareiss's first step (divisor
  *    1) reproduces EXCEPT for a value-changing double round-trip —
  *    keeping every k ≤ 3 readout bit-identical to round 18's.
  *
  * Intermediate Bareiss entries are ratios of 2×2 minors to the prior
  * pivot, so magnitudes stay on the order of the input entries —
  * unlike minor expansion there is no factorial blow-up in either
  * time or operand size.
  */
object ExactLinAlg {

  /** 12dp-rounded product — every multiply in a matrix readout goes
    * through this so both engines see the identical fixed-point
    * recurrence. */
  def mul12(a: JBD, b: JBD): JBD =
    a.multiply(b).setScale(12, RoundingMode.HALF_UP)

  /** Cross-engine division: exact IEEE double quotient, rounded back
    * to a 12dp decimal (the oracle twin is
    * `ROUND(CAST(a AS DOUBLE) / CAST(b AS DOUBLE), 12)`). */
  def div12(a: JBD, b: JBD): JBD =
    new JBD(a.doubleValue / b.doubleValue)
      .setScale(12, RoundingMode.HALF_UP)

  /** Deterministic exact-decimal determinant: sizes ≤ 2 by literal
    * minor expansion (12dp products), sizes ≥ 3 by fraction-free
    * Bareiss elimination in the fixed natural pivot order — O(n³)
    * mul12/div12 steps, never O(n!).
    *
    * A zero pivot mid-elimination fails loudly (the matrices this
    * serves are covariance/Hessian forms, positive definite on any
    * non-degenerate input; a zero pivot means degenerate data and the
    * CALLER's singularity message should fire, so this returns
    * `None` for the caller to translate). */
  def det12(mx: Vector[Vector[JBD]]): Option[JBD] = {
    val n = mx.size
    require(mx.forall(_.size == n), "det12: matrix must be square")
    if (n == 0) Some(JBD.ONE)
    else if (n == 1) Some(mx(0)(0))
    else if (n == 2)
      Some(mul12(mx(0)(0), mx(1)(1)).subtract(mul12(mx(0)(1), mx(1)(0))))
    else {
      // Bareiss: m[i][j] <- (m[k][k]*m[i][j] - m[i][k]*m[k][j]) / prev
      // with prev = m[k-1][k-1] of the PREVIOUS step (1 for k = 0, so
      // the first step divides by nothing). Fixed order, no pivoting.
      val a = Array.tabulate(n, n)((i, j) => mx(i)(j))
      var prev: Option[JBD] = None // divisor; None = 1 (skip division)
      var k = 0
      var singular = false
      while (k < n - 1 && !singular) {
        val pivot = a(k)(k)
        // a zero pivot anywhere invalidates the recurrence (and would
        // divide by zero one step later) — positive-definite inputs
        // never hit this; degenerate data must fail at the caller
        if (pivot.signum == 0) singular = true
        else {
          var i = k + 1
          while (i < n) {
            var j = k + 1
            while (j < n) {
              val num = mul12(pivot, a(i)(j))
                .subtract(mul12(a(i)(k), a(k)(j)))
              a(i)(j) = prev match {
                case Some(p) => div12(num, p)
                case None    => num
              }
              j += 1
            }
            i += 1
          }
          prev = Some(pivot)
          k += 1
        }
      }
      if (singular) None else Some(a(n - 1)(n - 1))
    }
  }

  /** Signed cofactor C(i, j) of `mx` — `det12` of the minor with the
    * checkerboard sign. O(n³) per cofactor; the full adjugate loop the
    * callers run is O(n⁵), comfortably interactive at the largest
    * allowed sizes (n = 15 ⇒ ~10⁶ fixed-point ops). A singular minor
    * is a legitimate zero-determinant value, not an error. */
  def cofactor12(mx: Vector[Vector[JBD]], i: Int, j: Int): JBD = {
    val n = mx.size
    val minor = Vector.tabulate(n - 1, n - 1) { (r, c) =>
      mx(if (r < i) r else r + 1)(if (c < j) c else c + 1)
    }
    val d = det12(minor).getOrElse(JBD.ZERO)
    if ((i + j) % 2 == 0) d else d.negate()
  }

  /** The symbolic SQL twin of [[det12]] — generates DuckDB SQL that
    * replays the identical fixed-point recurrence over entry
    * EXPRESSIONS (column names or nested SQL), so an oracle can hold
    * a driver readout to the digit. `wide` widens only the top-level
    * (never re-multiplied) result to DECIMAL(30,12); inner
    * re-multiplied values ride DECIMAL(18,12) — the documented sf0.01
    * magnitude envelope. Sizes ≤ 2 mirror det12's special case. */
  def det12Sql(mx: Vector[Vector[String]], wide: Boolean): String = {
    val outT = if (wide) "DECIMAL(30,12)" else "DECIMAL(18,12)"
    // products widen to DECIMAL(30,12) (operands are entry-scale,
    // DECIMAL(18,12)); each step's ENTRY value — a 2×2-minor ratio,
    // entry-scale by Bareiss's size argument — rides DECIMAL(18,12)
    def mulSql(a: String, b: String): String =
      s"CAST(ROUND(CAST($a AS DECIMAL(18,12)) * " +
        s"CAST($b AS DECIMAL(18,12)), 12) AS DECIMAL(30,12))"
    def divSql(num: String, den: String): String =
      s"CAST(ROUND(CAST(($num) AS DOUBLE) / CAST(($den) AS DOUBLE), " +
        "12) AS DECIMAL(18,12))"
    val n = mx.size
    if (n == 0) s"CAST(1 AS $outT)"
    else if (n == 1) s"CAST(${mx(0)(0)} AS $outT)"
    else if (n == 2)
      s"CAST((${mulSql(mx(0)(0), mx(1)(1))} - " +
        s"${mulSql(mx(0)(1), mx(1)(0))}) AS $outT)"
    else {
      var a = mx
      var prev: Option[String] = None
      for (k <- 0 until n - 1) {
        val pivot = a(k)(k)
        val next = Vector.tabulate(n, n) { (i, j) =>
          if (i <= k || j <= k) a(i)(j)
          else {
            val num = s"${mulSql(pivot, a(i)(j))} - " +
              s"${mulSql(a(i)(k), a(k)(j))}"
            prev match {
              case Some(p) => divSql(num, p)
              case None    => s"CAST(($num) AS DECIMAL(18,12))"
            }
          }
        }
        prev = Some(pivot)
        a = next
      }
      s"CAST(${a(n - 1)(n - 1)} AS $outT)"
    }
  }
}
