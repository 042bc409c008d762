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
  * Semantics are pinned to the STANDARD Winkler form, computed over
  * UTF-8 BYTES — exactly what the DuckDB oracle's
  * `jaro_winkler_similarity` runs, so a threshold compare replays
  * bit-for-bit on BOTH engines for any input (empirically verified on
  * ASCII textbook vectors AND accented names — café/cafe scores the
  * byte-wise 0.848333…, not the per-character 0.883…): match window
  * `max(|a|,|b|)/2 − 1`, transpositions = half the out-of-order
  * matches, prefix bonus `ℓ·0.1·(1−jaro)` with `ℓ` capped at 4 and
  * applied only when `jaro > 0.7`, and EITHER side empty → 0 (DuckDB's
  * rule, including both-empty — callers wanting ""≡"" use exact
  * equality instead). Byte semantics mean a multi-byte character
  * counts as that many symbols — stated, shared with the oracle, and
  * allocation-free (the kernel walks the UTF8String's bytes directly;
  * no String decode on the per-candidate-pair hot path).
  */
object JaroWinklerKernel {
  def sim(a: UTF8String, b: UTF8String): Double = {
    val la = a.numBytes()
    val lb = b.numBytes()
    if (la == 0 || lb == 0) return 0.0
    if (a.equals(b)) return 1.0
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
        if (!mb(j) && b.getByte(j) == a.getByte(i)) {
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
        if (a.getByte(i) != b.getByte(k)) t += 1
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
    while (l < maxL && a.getByte(l) == b.getByte(l)) l += 1
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
