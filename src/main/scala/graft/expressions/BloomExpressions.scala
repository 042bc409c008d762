package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd expression —
  * the per-row kernel of [[graft.operators.Bloom.bloomPrunedJoin]].
  *
  * Why not a Scala UDF: the UDF formulation works but pays per-row
  * boxing (long -> java.lang.Long) and an opaque function call that
  * the fact-table scan stage cannot inline — on the 100 TB fact side
  * of a pruned join, the probe runs once per row of the biggest table
  * in the plan, so it must stay inside whole-stage codegen with the
  * scan, the way a built-in filter would.
  *
  * `filterBytes` is the SERIALIZED sketch as a foldable binary
  * expression (a literal, mirroring how Spark's runtime row-level
  * filtering injects its own bloom probes): the bytes are
  * deserialized ONCE per expression instance (`@transient lazy`) —
  * never per row — and the codegen path pins the deserialized filter
  * as a plan reference object. Key types: bigint (probed with the
  * sketch's long hasher) and string (probed over UTF-8 bytes, the
  * exact bytes `put`/`putString` inserted). A null key yields null —
  * under a `filter` that drops the row, matching the join it guards. */
case class BloomMightContain(key: Expression, filterBytes: Expression)
    extends BinaryExpression {

  override def left: Expression = key
  override def right: Expression = filterBytes

  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, filterBytes.dataType) match {
      case (LongType | StringType, BinaryType) if !filterBytes.foldable =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a foldable (literal) serialized filter")
      case (LongType | StringType, BinaryType) if filterBytes.eval(null) == null =>
        // Rejected at ANALYSIS: a null filter would otherwise make the
        // interpreted path null-out (silently dropping every row under
        // a filter) while the codegen path throws from the lazy
        // deserialize — two behaviors for one query. It would also
        // falsify `nullable` below, which assumes the probe itself
        // never introduces nulls.
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: serialized filter must not be null")
      case (LongType | StringType, BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (k, f) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint or string, binary), got " +
          s"(${k.simpleString}, ${f.simpleString})")
    }

  override def dataType: DataType = BooleanType
  // the filter operand is analysis-checked non-null, so only the key
  // contributes nulls
  override def nullable: Boolean = key.nullable

  @transient private lazy val filter: BloomFilter = {
    val bytes = filterBytes.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: serialized filter must not be null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(k: Any, ignoredBytes: Any): Any = key.dataType match {
    case LongType => filter.mightContainLong(k.asInstanceOf[Long])
    case StringType =>
      filter.mightContainBinary(k.asInstanceOf[UTF8String].getBytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The deserialized sketch rides the plan's reference array (shipped
    // once per stage with the task binary), so the generated probe is a
    // direct virtual call on a pinned object — no per-row boxing, no
    // deserialization, no literal byte-array traffic.
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (k, _) => key.dataType match {
      case LongType => s"${ev.value} = $bf.mightContainLong($k);"
      case StringType => s"${ev.value} = $bf.mightContainBinary($k.getBytes());"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(key = newLeft, filterBytes = newRight)
}
