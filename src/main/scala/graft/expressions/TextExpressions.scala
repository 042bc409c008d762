package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text canonicalization for fingerprinting: keep only
  * `[a-z0-9 ]` bytes, collapse space runs, trim — byte-for-byte equal
  * to `trim(regexp_replace(regexp_replace(x, "[^a-z0-9 ]", ""), " +",
  * " "))` on an already-lowercased input (multi-byte UTF-8 chars
  * consist solely of bytes >= 0x80, so dropping non-matching bytes
  * drops exactly the codepoints the regex drops).
  *
  * Two Java-regex engine passes over every document is the dominant
  * cost of exact text dedup at corpus scale; this runs one branch-free
  * byte loop inside codegen instead.
  */
case class CleanAsciiText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_clean_text"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Byte](s.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val b = s(i)
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (keep) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = b; n += 1
      } else if (b == ' ') {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |byte[] in$$ = $s.getBytes();
         |byte[] out$$ = new byte[in$$.length];
         |int n$$ = 0;
         |boolean pend$$ = false;
         |for (int i$$ = 0; i$$ < in$$.length; i$$++) {
         |  byte b$$ = in$$[i$$];
         |  boolean keep$$ = (b$$ >= 'a' && b$$ <= 'z') || (b$$ >= '0' && b$$ <= '9');
         |  if (keep$$) {
         |    if (pend$$ && n$$ > 0) out$$[n$$++] = ' ';
         |    pend$$ = false;
         |    out$$[n$$++] = b$$;
         |  } else if (b$$ == ' ') {
         |    pend$$ = true;
         |  }
         |}
         |${ev.value} = $utf8.fromBytes(java.util.Arrays.copyOf(out$$, n$$));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CleanAsciiText =
    copy(child = newChild)
}
