package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** dHash-style 64-bit perceptual signature of a binary payload — the
  * gradient-hash recipe behind image near-duplicate detection, applied
  * to the raw bytes as the container's deterministic stand-in for a
  * real decode (media codecs are pluggable, cf.
  * [[graft.operators.Multimodal.Decoder]]; a production deployment
  * hashes the decoded grayscale plane with the identical grid/gradient
  * step, so the downstream banding/verification pipeline is unchanged).
  *
  * Recipe (pinned by the q104 oracle, which replays it byte-for-byte
  * from the hex dump): sample a 8-row x 9-column grid over the payload
  * — grid cell g in [0, 72) reads the unsigned byte at offset
  * `(g * len) / 72` (integer division; cells repeat bytes when
  * len < 72, exactly like downsampling a small image) — then bit
  * `r*8 + c` of the signature is set iff cell (r, c) < cell (r, c+1),
  * the horizontal-gradient rule of classic dHash. Empty payloads yield
  * signature 0 (no gradients), so all-empty payloads collide — the
  * correct dedup outcome, bounded by the banding pipeline's
  * `maxBucket` guard like every other degenerate key.
  *
  * Near-dups differ in few bits; compare with
  * [[graft.operators.Dedup.hammingDistance]] or band with
  * [[graft.operators.Dedup.hammingBandedPairs]] (the pigeonhole
  * recall guarantee is signature-family-agnostic). One Janino-compiled
  * pass per row, 64 branch-free-ish comparisons, no allocation.
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash64"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val len = bytes.length
    var sig = 0L
    if (len > 0) {
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val g = r * 9 + c
          val p1 = bytes(((g.toLong * len) / 72L).toInt) & 0xFF
          val p2 = bytes((((g + 1).toLong * len) / 72L).toInt) & 0xFF
          if (p1 < p2) sig |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      // freshName per instance: two DHash64 calls in one codegen scope
      // must not declare duplicate Java locals (Janino would reject the
      // whole generated class and silently fall back to interpreted).
      val len = ctx.freshName("len")
      val sig = ctx.freshName("sig")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      val g = ctx.freshName("g")
      val p1 = ctx.freshName("p1")
      val p2 = ctx.freshName("p2")
      s"""
         |int $len = $arr.length;
         |long $sig = 0L;
         |if ($len > 0) {
         |  for (int $r = 0; $r < 8; $r++) {
         |    for (int $c = 0; $c < 8; $c++) {
         |      int $g = $r * 9 + $c;
         |      int $p1 = $arr[(int) (((long) $g * $len) / 72L)] & 0xFF;
         |      int $p2 = $arr[(int) (((long) ($g + 1) * $len) / 72L)] & 0xFF;
         |      if ($p1 < $p2) $sig |= 1L << ($r * 8 + $c);
         |    }
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}
