package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The byte↔unicode table of byte-level BPE (the GPT-2 lineage —
  * Radford et al. 2019, "Language Models are Unsupervised Multitask
  * Learners", public `bytes_to_unicode` rule): every byte 0..255 maps
  * to one PRINTABLE code point — printable-latin bytes (33..126,
  * 161..172, 174..255) to their own code point, the remaining 68
  * bytes to 256+k in byte order. The mapped alphabet is 256 distinct
  * BMP code points, so ANY byte sequence becomes a visible,
  * whitespace-free string and the char-level BPE machinery
  * ([[graft.operators.Corpus.bpeMerges]]/`bpeEncode`) runs on byte
  * symbols unchanged — full coverage of arbitrary text with no unk
  * token, because every character decomposes into known byte symbols
  * (the byte-fallback property). */
object ByteUnicode {

  /** 256-char table, index = byte value. All entries are single
    * UTF-16 chars (max code point 0x143). */
  val Alphabet: String = {
    val printable =
      ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val sb = new StringBuilder
    var k = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) sb.append(b.toChar)
      else { sb.append((256 + k).toChar); k += 1 }
      b += 1
    }
    sb.toString
  }

  private[expressions] val Inverse: Array[Int] = {
    val inv = Array.fill(0x144)(-1)
    var b = 0
    while (b < 256) { inv(Alphabet.charAt(b)) = b; b += 1 }
    inv
  }

  /** Driver-side forward map (spec/oracle tooling). */
  def map(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = Alphabet.charAt(bytes(i) & 0xff)
      i += 1
    }
    new String(out)
  }
}

/** String → its byte-level-BPE symbol string: UTF-8 bytes each mapped
  * through [[ByteUnicode.Alphabet]]. Native because it runs once per
  * word occurrence corpus-wide in the encode path (the
  * [[UnigramSegment]] lesson: interpreted HOF chains over hex/conv
  * per byte are ~20× slower than one compiled method). */
case class ByteUnicodeMap(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_byte_unicode"

  def mapBytes(input: UTF8String): UTF8String = {
    val bytes = input.getBytes
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = ByteUnicode.Alphabet.charAt(bytes(i) & 0xff)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  override def nullSafeEval(input: Any): Any =
    mapBytes(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("byteUnicodeMap", this,
      classOf[ByteUnicodeMap].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $self.mapBytes($in);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ByteUnicodeMap = copy(child = newChild)
}

/** The exact inverse of [[ByteUnicodeMap]]: each mapped code point
  * back to its byte, the byte sequence re-read as a string. A code
  * point outside the 256-entry table reads NULL (the input was not a
  * byte-level symbol string) — never a partial decode. Decoding a
  * WHOLE mapped word always yields valid UTF-8 (it is the original
  * bytes); decoding a lone mid-sequence token may not, which is the
  * caller's contract to respect. */
case class ByteUnicodeUnmap(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_byte_unicode_inv"

  def unmapBytes(input: UTF8String): UTF8String = {
    val s = input.toString
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val b = if (c < ByteUnicode.Inverse.length)
        ByteUnicode.Inverse(c) else -1
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(input: Any): Any =
    unmapBytes(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("byteUnicodeUnmap", this,
      classOf[ByteUnicodeUnmap].getName)
    // a non-table code point yields null WITH isNull set — consumers
    // must see the null flag, not a null value behind isNull = false
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = $self.unmapBytes($in);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ByteUnicodeUnmap = copy(child = newChild)
}
