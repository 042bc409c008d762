package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The composed higher-order-function formulations
  * ([[graft.functions.ArrayFunctions.cosineSimilarity]]) are correct but
  * interpreted: every row evaluates a lambda tree and allocates
  * intermediate arrays (`zip_with` product array, `aggregate` steps).
  * Scoring 100 TB of embeddings is a tight numeric loop — these
  * expressions generate exactly that loop via `doGenCode`, keeping the
  * whole stage inside Janino-compiled code with zero per-row allocation.
  *
  * Semantics mirror the HOF versions bit-for-bit on well-formed input
  * (same element order, same double accumulation, same IEEE ops):
  * unequal lengths or a null element yield null, exactly like
  * `zip_with`'s null padding propagating through the sum.
  */
abstract class BinaryFloatVectorExpression extends BinaryExpression {
  // AbstractDataType (the ExpectsInputTypes currency) is private[sql],
  // so third-party expressions type-check explicitly instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<float>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  // nulls also arise from unequal lengths / null elements, not just
  // null inputs — the default nullSafeEval short-circuit still applies
  // to null inputs, and we add the data-dependent cases.
  override def nullable: Boolean = true
}

/** Dot product of two float vectors, accumulated in double
  * left-to-right. */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryFloatVectorExpression {

  override def prettyName: String = "graft_dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // ctx.freshName per instance: with NON-nullable children the
      // nullSafeCodeGen wrapper emits no scoping braces, so two
      // instances in one codegen scope would redefine fixed-named
      // locals and fail Janino — a silent whole-plan fallback to
      // interpreted evaluation (probe-confirmed round 11).
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two float vectors: one fused loop accumulating
  * dot product and both norms, `dot / (sqrt(na) * sqrt(nb))` — the same
  * IEEE operations, in the same order, as the composed
  * dot/l2Norm/divide formulation. */
case class CosineSimF32(left: Expression, right: Expression)
    extends BinaryFloatVectorExpression {

  override def prettyName: String = "graft_cosine_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName: see DotProductF32 — fixed names break Janino when
      // two instances share a scope over non-nullable children. This
      // one is load-bearing: Ivf.assign/assignProbes put model.k
      // instances in ONE projection.
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimF32 =
    copy(left = newLeft, right = newRight)
}

/** Fused int8 quantize + integer dot against pre-quantized query codes:
  * `(dot_q, scale)` where `scale = maxAbs == 0 ? 0 : 127 / maxAbs` and
  * `dot_q = Σ clamp(floor(x_i * scale + 0.5), -127, 127) * qcode_i` —
  * bit-identical to composing
  * [[graft.operators.Similarity.quantizeInt8]] with a `zip_with` /
  * `aggregate` dot (same IEEE ops in the same order, exact integer
  * accumulation), but one two-pass Janino loop per row with zero
  * allocation instead of an interpreted lambda tree materializing the
  * code array. Null on length mismatch or a null element, like the
  * HOF formulation. */
case class QuantizedDotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_quantized_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("dot_q", LongType, nullable = false),
    StructField("scale", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != q.numElements()) return null
    var ma = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || q.isNullAt(i)) return null
      val ax = math.abs(x.getFloat(i).toDouble)
      if (ax > ma) ma = ax
      i += 1
    }
    val scale = if (ma == 0.0) 0.0 else 127.0 / ma
    var dot = 0L
    i = 0
    while (i < n) {
      val c = math.max(-127L,
        math.min(127L, math.floor(x.getFloat(i).toDouble * scale + 0.5).toLong))
      dot += c * q.getInt(i)
      i += 1
    }
    new GenericInternalRow(Array[Any](dot, scale))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, q) => {
      // freshName: see DotProductF32 — fixed names break Janino when
      // two instances share a scope over non-nullable children.
      val n = ctx.freshName("n")
      val ma = ctx.freshName("ma")
      val i = ctx.freshName("i")
      val ax = ctx.freshName("ax")
      val scale = ctx.freshName("scale")
      val dot = ctx.freshName("dot")
      val c = ctx.freshName("c")
      s"""
         |int $n = $x.numElements();
         |if ($n != $q.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ma = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $q.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $ax = java.lang.Math.abs((double) $x.getFloat($i));
         |    if ($ax > $ma) $ma = $ax;
         |  }
         |  if (!${ev.isNull}) {
         |    double $scale = ($ma == 0.0) ? 0.0 : 127.0 / $ma;
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $c = java.lang.Math.max(-127L, java.lang.Math.min(127L,
         |        (long) java.lang.Math.floor((double) $x.getFloat($i) * $scale + 0.5)));
         |      $dot += $c * (long) $q.getInt($i);
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{java.lang.Long.valueOf($dot), java.lang.Double.valueOf($scale)});
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotF32 =
    copy(left = newLeft, right = newRight)
}

/** All `m` PQ sub-centroid assignments of a float vector as ONE
  * expression node — a runtime loop over a pinned flat codebook
  * instead of `m x k` inlined dot-product plan nodes.
  *
  * Why this exists: the composed-builtins PQ encode —
  * `array_max(array(struct(dot(slice(v,...), centroid_literal) - ...`
  * per (subspace, cell) — is correct but inlines one scored struct
  * per sub-centroid into the projection: at the m=8, k=16 test
  * geometry that is 128 dot-product subtrees, whose generated
  * `doConsume` method exceeds Janino's 64 KB limit and silently
  * drops the WHOLE stage out of codegen (observed in q114/q115's
  * plans: `WholeStageCodegenExec ... Code grows beyond 64 KB`); a
  * production m=16, k=256 codebook would be 4096 subtrees and not
  * even analyze cheaply. Here the codebook rides the plan's
  * reference array ([[graft.expressions.ReplaceChain]]'s discipline —
  * shipped once per stage with the task binary) and both eval paths
  * run the same three nested loops, so plan size, codegen size, and
  * analysis cost are CONSTANT in `m·k·dsub`.
  *
  * Semantics replicate the composed formulation bit-for-bit: per
  * subspace, score every cell by `dot(sub-vector, centroid) −
  * ‖centroid‖²/2` (the L2-argmin surrogate; dot accumulated in
  * doubles over float products, ascending dimension — exactly
  * [[DotProductF32]]'s fold), ties toward the HIGHER cell id (the
  * `array_max` struct convention, reproduced by scanning cells
  * ascending with `>=`). A vector of the wrong length or with a null
  * element yields null.
  *
  * `flat` is the row-major `m x k x dsub` codebook; it rides the case
  * class so tree equality and canonicalization see it. */
case class PqEncode(
    child: Expression,
    flat: Seq[Float],
    m: Int,
    k: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(m > 0 && k > 0, s"$prettyName: m ($m) and k ($k) must be positive")
  require(flat.nonEmpty && flat.length % (m * k) == 0,
    s"$prettyName: flat codebook length ${flat.length} is not m*k*dsub " +
      s"for m=$m, k=$k")

  def dsub: Int = flat.length / (m * k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // nullable even over a non-null child: a wrong-length vector yields
  // null — without this override nullSafeCodeGen would emit no isNull
  // local for non-nullable children and the assignment would not compile
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val cb: Array[Float] = flat.toArray
  // ‖centroid‖²/2 per (sub, cell), accumulated in the SAME ascending
  // double-over-float fold as Pq.normSq — bit-identical surrogate
  @transient private lazy val halfNorms: Array[Double] = {
    val hn = new Array[Double](m * k)
    var sc = 0
    while (sc < m * k) {
      var acc = 0.0
      var j = 0
      while (j < dsub) {
        val x = cb(sc * dsub + j).toDouble
        acc += x * x
        j += 1
      }
      hn(sc) = acc / 2.0
      sc += 1
    }
    hn
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = dsub
    if (v.numElements() != m * d) return null
    var i = 0
    while (i < m * d) { if (v.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.NegativeInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        var dot = 0.0
        var j = 0
        while (j < d) {
          dot += v.getFloat(s * d + j).toDouble *
            cb((s * k + c) * d + j).toDouble
          j += 1
        }
        val score = dot - halfNorms(s * k + c)
        if (score >= best) { best = score; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
    val hnRef = ctx.addReferenceObj("pqHalfNorms", halfNorms, "double[]")
    nullSafeCodeGen(ctx, ev, in => {
      val d = dsub
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      s"""
         |if ($in.numElements() != ${m * d}) { ${ev.isNull} = true; }
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < ${m * d}; $i++) {
         |    if ($in.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    double $best = Double.NEGATIVE_INFINITY;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $d; $j++) {
         |        $dot += (double) $in.getFloat($s * $d + $j)
         |          * (double) $cbRef[($s * $k + $c) * $d + $j];
         |      }
         |      double $score = $dot - $hnRef[$s * $k + $c];
         |      if ($score >= $best) { $best = $score; $bestC = $c; }
         |    }
         |    $codes[$s] = $bestC;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
