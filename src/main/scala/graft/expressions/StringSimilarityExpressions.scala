package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler kernel, shared by interpreted eval and generated
  * code (the generated code calls this static method — the expression
  * stays inside whole-stage codegen; the kernel itself needs two
  * boolean scratch arrays, which generated inline code could not
  * allocate more cheaply).
  *
  * Semantics are pinned to the STANDARD Winkler form so the DuckDB
  * oracle's `jaro_winkler_similarity` replays it bit-for-bit
  * (empirically verified on the fixture alphabet): match window
  * `max(|a|,|b|)/2 − 1`, transpositions = half the out-of-order
  * matches, prefix bonus `ℓ·0.1·(1−jaro)` with `ℓ` capped at 4 and
  * applied only when `jaro > 0.7`, and EITHER side empty → 0 (DuckDB's
  * rule, including both-empty — callers wanting ""≡"" use exact
  * equality instead). Comparison is per UTF-16 code unit — identical
  * to byte-wise for the ASCII identifiers linkage compares; documented
  * divergence for non-BMP text.
  */
object JaroWinklerKernel {
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b.charAt(j) == a.charAt(i)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // the exact operation order the oracle's implementation runs —
    // bit-stability of the comparison against a threshold depends on it
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Jaro–Winkler similarity of two strings in [0, 1] — the
  * record-linkage community's standard typo-tolerant name comparator
  * (Winkler 1990, on Jaro 1989): match-window character agreement,
  * transposition discount, common-prefix bonus. The comparison-level
  * primitive under fuzzy-agreement Fellegi–Sunter scoring
  * ([[graft.operators.Linkage]]) — a one-keystroke typo scores ~0.97
  * where exact equality scores 0.
  *
  * Null-safe (NULL in → NULL out); kernel semantics and the DuckDB
  * parity contract documented on [[JaroWinklerKernel]].
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.sim(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      // a static kernel call, not inline loops: the expression stays in
      // whole-stage codegen (no fallback), and the JIT'd kernel owns the
      // scratch arrays the match/transposition passes need
      s"${ev.value} = graft.expressions.JaroWinklerKernel.sim($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
