package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N sequential literal string replacements as ONE expression node — a
  * runtime loop over a pinned pattern table instead of N nested
  * `replace` plan nodes.
  *
  * Why this exists: [[graft.operators.Corpus.bpeEncode]] applies a
  * learned BPE merge table in rank order. The composed-builtins
  * formulation — `merges.foldLeft(repr)((r, m) => replace(r, ...))` —
  * is correct but builds an expression tree one `replace` node DEEP
  * per merge: fine at the 8 merges the test corpora train, fatal at a
  * production tokenizer's 32k-merge vocabulary (analyzer/optimizer
  * recursion over a 32k-deep tree, Janino's 64KB method limit, and a
  * silent interpreted fallback at best). Here the pattern table lives
  * in the plan's reference array — shipped once per stage with the
  * task binary, like [[BloomMightContain]]'s sketch — and both eval
  * paths run the same tight `UTF8String.replace` loop, so plan size,
  * codegen size, and analysis cost are CONSTANT in the merge count.
  *
  * Semantics per step are exactly the `replace` built-in's
  * (`UTF8String.replace` — literal, non-overlapping, left-to-right;
  * the same kernel Spark's `StringReplace` calls), so a chain of k
  * steps is value-identical to k nested `replace` calls — pinned by
  * the equivalence spec and transitively by the q105/q107/q108
  * oracles, which replay rank-order merge application in SQL.
  *
  * `searches`/`replacements` ride the case class (extracted from
  * foldable array literals by the [[GraftFunctions]] builder), so tree
  * equality, `semanticEquals`, and canonicalization see the table. */
case class ReplaceChain(
    child: Expression,
    searches: Seq[String],
    replacements: Seq[String]) extends UnaryExpression {

  require(searches.length == replacements.length,
    s"$prettyName: ${searches.length} search patterns vs " +
      s"${replacements.length} replacements")
  require(searches.forall(s => s != null && s.nonEmpty),
    s"$prettyName: search patterns must be non-null and non-empty " +
      "(an empty search would match nowhere yet claim to apply)")
  require(replacements.forall(_ != null),
    s"$prettyName: replacements must be non-null")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_replace_chain"

  @transient private lazy val searchU: Array[UTF8String] =
    searches.map(UTF8String.fromString).toArray
  @transient private lazy val replaceU: Array[UTF8String] =
    replacements.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String]
    val se = searchU
    val re = replaceU
    var i = 0
    while (i < se.length) {
      s = s.replace(se(i), re(i))
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utf8 = "org.apache.spark.unsafe.types.UTF8String"
    // The pattern arrays are plan reference objects — the generated
    // loop is three lines regardless of how many thousand patterns
    // the table holds, and no pattern bytes are inlined into Java
    // source (a 32k-merge table as string literals would alone blow
    // Janino's constant pool).
    val se = ctx.addReferenceObj("replaceChainSearch", searchU, s"$utf8[]")
    val re = ctx.addReferenceObj("replaceChainReplace", replaceU, s"$utf8[]")
    nullSafeCodeGen(ctx, ev, in => {
      // freshName per instance: two chains in one codegen scope must
      // not collide (see DHash64 / CleanAsciiText).
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |$utf8 $s = $in;
         |for (int $i = 0; $i < $se.length; $i++) {
         |  $s = $s.replace($se[$i], $re[$i]);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ReplaceChain =
    copy(child = newChild)
}
