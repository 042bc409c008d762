package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature of a distinct-shingle string array as ONE native
  * expression: each shingle is hashed once (xxhash64 over its bytes),
  * then the k family members derive from re-hashing that 8-byte value
  * with the member index as seed, taking the element-wise running min.
  *
  * The higher-order-function formulation
  * ([[graft.operators.Dedup.minHashSignature]]) evaluates an
  * interpreted lambda tree per shingle and allocates two k-element
  * arrays per step (`transform` + `zip_with`) — for k=64 over ~10^2
  * shingles/doc that is ~10^4 interpreted array allocations per
  * document. This expression runs the k x shingles loop inside
  * Janino-generated code with a single k-long signature buffer per row.
  *
  * Same recipe, different mechanics: no wrap-around arithmetic anywhere
  * (ANSI-safe by construction — hashing, comparison, and min only).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"minhash signature width must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h0 = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(h0, j + 1L)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      // ctx.freshName per instance: with non-nullable children the
      // nullSafeCodeGen wrapper emits no scoping braces, so fixed
      // local names would redefine across instances and fail Janino
      // (silent interpreted fallback) — see VectorExpressions.
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h0 = ctx.freshName("h0")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  long $h0 = $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = $xxh.hashLong($h0, (long) ($j + 1));
         |    if ($h < $sig[$j]) $sig[$j] = $h;
         |  }
         |}
         |${ev.value} = new $gad($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a token array, joined with '_' —
  * the native form of [[graft.functions.TextFunctions.wordShingles]]'
  * `transform(sequence) + concat_ws + slice + array_distinct`
  * composition, which interprets four lambda layers and allocates a
  * slice array per shingle. Here: one pass, one LinkedHashSet (first
  * occurrence order, matching array_distinct), strings built with
  * UTF8String.concatWs (no JVM String round-trip).
  *
  * Fewer than n tokens yields an empty array, like the composed form.
  */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString("_")
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val gad = classOf[GenericArrayData].getName
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      // freshName: see MinHashSig — fixed names break Janino when two
      // instances share a scope over non-nullable children.
      val m = ctx.freshName("m")
      val sep = ctx.freshName("sep")
      val seen = ctx.freshName("seen")
      val win = ctx.freshName("win")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $m = $toks.numElements();
         |if ($m < $n) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  $utf8 $sep = $utf8.fromString("_");
         |  java.util.LinkedHashSet<$utf8> $seen = new java.util.LinkedHashSet<$utf8>();
         |  $utf8[] $win = new $utf8[$n];
         |  for (int $i = 0; $i <= $m - $n; $i++) {
         |    for (int $j = 0; $j < $n; $j++) $win[$j] = $toks.getUTF8String($i + $j);
         |    $seen.add($utf8.concatWs($sep, $win));
         |  }
         |  ${ev.value} = new $gad($seen.toArray());
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}
