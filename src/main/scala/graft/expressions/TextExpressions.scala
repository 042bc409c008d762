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
      // ctx.freshName per instance: with non-nullable children the
      // nullSafeCodeGen wrapper emits no scoping braces, so fixed
      // local names would redefine across instances and fail Janino
      // (silent interpreted fallback) — see VectorExpressions.
      val in = ctx.freshName("in")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val pend = ctx.freshName("pend")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val keep = ctx.freshName("keep")
      s"""
         |byte[] $in = $s.getBytes();
         |byte[] $out = new byte[$in.length];
         |int $n = 0;
         |boolean $pend = false;
         |for (int $i = 0; $i < $in.length; $i++) {
         |  byte $b = $in[$i];
         |  boolean $keep = ($b >= 'a' && $b <= 'z') || ($b >= '0' && $b <= '9');
         |  if ($keep) {
         |    if ($pend && $n > 0) $out[$n++] = ' ';
         |    $pend = false;
         |    $out[$n++] = $b;
         |  } else if ($b == ' ') {
         |    $pend = true;
         |  }
         |}
         |${ev.value} = $utf8.fromBytes(java.util.Arrays.copyOf($out, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CleanAsciiText =
    copy(child = newChild)
}

/** Unicode normalization (UAX #15) of a string column — the text-prep
  * step web-corpus pipelines run FIRST, because every downstream
  * operator keyed on text bytes (exact dedup hashes, shingles, token
  * counts, fingerprints) silently fragments when the same visible
  * string arrives in composed and decomposed forms ("é" as U+00E9 vs
  * "e"+U+0301). `form` is one of NFC | NFD | NFKC | NFKD, fixed at
  * plan time. Delegates to `java.text.Normalizer` (the JDK's UAX #15
  * implementation); already-normalized text — the overwhelming common
  * case — short-circuits through `isNormalized`, which is a scan
  * without allocation. Map-only, null-preserving; NFC output is
  * byte-identical to engines exposing UAX #15 (e.g. a `nfc_normalize`
  * SQL function), which is what lets the oracle re-check it. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val normForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType
        if Seq("NFC", "NFD", "NFKC", "NFKD").contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: form must be NFC, NFD, NFKC or NFKD, got '$form'")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, normForm))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val norm = "java.text.Normalizer"
      val str = ctx.freshName("str")
      s"""
         |String $str = $s.toString();
         |if ($norm.isNormalized($str, $norm.Form.$form)) {
         |  ${ev.value} = $s;
         |} else {
         |  ${ev.value} = $utf8.fromString($norm.normalize($str, $norm.Form.$form));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** width-bit SimHash (width <= 64) from an array of per-token hash
  * values: accumulate `width` +1/-1 counters over the low `width` bits
  * of each hash, pack the sign pattern into a long (bit width-1 lands
  * in the long's sign bit at width=64 — two's-complement packing, the
  * same value a 64-bit unsigned pack reinterpreted signed would give).
  *
  * The width is a Literal parameter, not hardcoded: a 32-bit signature
  * banded 4 ways gives 8-bit band keys (256 buckets — saturates near
  * 10^5 docs), while 64 bits at the same band count gives 16-bit keys
  * (65536 buckets) and headroom to 10^8 docs; the banding recall
  * guarantee survives corpus growth by widening here, not by silently
  * dropping buckets.
  *
  * The token hashing itself stays a composed column (pluggable: fast
  * xxhash64 or an md5-portable variant); this expression replaces the
  * interpreted `aggregate`/`zip_with` accumulation — per token, one
  * tight width-iteration loop instead of an interpreted lambda tree
  * allocating two width-element arrays. */
case class SimHashFromHashes(child: Expression, width: Int) extends UnaryExpression {

  require(width >= 1 && width <= 64,
    s"simhash width must be in [1, 64], got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> token hashes, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val counts = new Array[Long](width)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < width) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < width) { if (counts(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      // freshName: see CleanAsciiText — fixed names break Janino when
      // two instances share a scope over non-nullable children.
      val cnt = ctx.freshName("cnt")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      val sim = ctx.freshName("sim")
      s"""
         |long[] $cnt = new long[$width];
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($hs.isNullAt($i)) continue;
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < $width; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $cnt[$b]++; else $cnt[$b]--;
         |  }
         |}
         |long $sim = 0L;
         |for (int $b2 = 0; $b2 < $width; $b2++) if ($cnt[$b2] > 0) $sim |= (1L << $b2);
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashFromHashes =
    copy(child = newChild)
}
