package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Intersection size of two SORTED-ascending long arrays via a single
  * merge walk — the per-pair kernel of exact Jaccard verification.
  *
  * Why this exists: `array_intersect` on string shingle arrays builds a
  * hash set and re-hashes every UTF8String PER PAIR — measured ~80% of
  * the windowed n-gram dedup's wall clock. Hashing each shingle ONCE
  * per document (xxhash64, map-side), sorting, and merge-walking the
  * long arrays does the same counting with zero per-pair allocation
  * and primitive comparisons only, inside whole-stage codegen. It also
  * shrinks the pair-join shuffle: 8 bytes per shingle instead of a
  * ~20-byte string.
  *
  * Contract: both inputs sorted ascending with distinct elements
  * (`array_sort` over hashed DISTINCT shingles — see
  * [[graft.functions.TextFunctions.hashedShingles]]). Null input or
  * null element yields null. Jaccard over hashed sets equals Jaccard
  * over the original sets unless two distinct shingles collide in 64
  * bits (~2^-64 per pair) — the standard trade every hashed-shingle
  * dedup makes.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_sorted_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName, not fixed names: two instances of this expression in
      // one codegen scope (e.g. non-nullable inputs, no wrapping block)
      // would otherwise declare duplicate locals — a Janino compile
      // error and a silent fallback out of whole-stage codegen.
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xi = $x.getLong($i);
         |  long $yj = $y.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Sparse dot product of two (sorted keys, aligned values) vector
  * pairs via a single merge walk — the per-pair verification kernel of
  * exact all-pairs cosine ([[graft.operators.Apss]]).
  *
  * Why this exists: verifying an APSS candidate pair with a relational
  * join (pair ⋈ features-of-a ⋈ features-of-b on the shared key, then
  * a per-pair sum) expands every pair by ALL of one side's features
  * and shuffles that blow-up twice — measured ~60% of q159's wall
  * clock at 1.7M candidates. Carrying each document's vector ONCE as
  * (sorted key array, value array) and merge-walking per pair does the
  * same sum with zero shuffle, zero per-pair allocation, and primitive
  * comparisons only, inside whole-stage codegen — the
  * [[SortedIntersectCount]] argument, extended from counting to a
  * weighted sum.
  *
  * Contract: `keysA`/`keysB` sorted ascending and distinct (xxhash64'd
  * feature keys — the same 2^-64-per-pair collision trade
  * [[SortedIntersectCount]] documents), `valsA`/`valsB` index-aligned
  * with their key arrays (enforced loudly: a length mismatch throws,
  * it never truncates the walk). Null input or null element yields
  * null. */
case class SparseDotSorted(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def prettyName: String = "graft_sparse_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _),
            ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<double>, " +
          s"array<bigint>, array<double>), got (${a.simpleString}, " +
          s"${b.simpleString}, ${c.simpleString}, ${d.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(ka: Any, va: Any, kb: Any, vb: Any): Any = {
    val xk = ka.asInstanceOf[ArrayData]
    val xv = va.asInstanceOf[ArrayData]
    val yk = kb.asInstanceOf[ArrayData]
    val yv = vb.asInstanceOf[ArrayData]
    val nx = xk.numElements()
    val ny = yk.numElements()
    if (xv.numElements() != nx || yv.numElements() != ny)
      throw new IllegalArgumentException(
        s"$prettyName: keys/values arrays are not index-aligned " +
          s"($nx keys vs ${xv.numElements()} values; " +
          s"$ny keys vs ${yv.numElements()} values)")
    var i = 0
    var j = 0
    var acc = 0.0
    while (i < nx && j < ny) {
      if (xk.isNullAt(i) || yk.isNullAt(j) ||
          xv.isNullAt(i) || yv.isNullAt(j)) return null
      val xi = xk.getLong(i)
      val yj = yk.getLong(j)
      if (xi == yj) { acc += xv.getDouble(i) * yv.getDouble(j); i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xk, xv, yk, yv) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $xk.numElements();
         |int $ny = $yk.numElements();
         |if ($xv.numElements() != $nx || $yv.numElements() != $ny) {
         |  throw new IllegalArgumentException(
         |    "graft_sparse_dot: keys/values arrays are not index-aligned");
         |}
         |int $i = 0, $j = 0;
         |double $acc = 0.0;
         |while ($i < $nx && $j < $ny) {
         |  if ($xk.isNullAt($i) || $yk.isNullAt($j) ||
         |      $xv.isNullAt($i) || $yv.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xi = $xk.getLong($i);
         |  long $yj = $yk.getLong($j);
         |  if ($xi == $yj) { $acc += $xv.getDouble($i) * $yv.getDouble($j); $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SparseDotSorted =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
