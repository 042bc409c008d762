package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.IntegerType

/** Registration + Column surface for the engine's native expressions.
  *
  * Spark 4 keeps Expression -> Column construction private, so the
  * supported route is the function registry: either install
  * [[GraftExtensions]] at session build time
  * (`spark.sql.extensions=graft.expressions.GraftExtensions`) or call
  * [[GraftFunctions.ensureRegistered]] on a live session — operators do
  * the latter automatically via `df.sparkSession`, so library users
  * never see the plumbing. Both paths register the same builders;
  * `call_function` resolves them at analysis time.
  */
object GraftFunctions {

  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  private def stringArg(name: String, e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name expects a literal string argument, got $other")
  }

  private def stringArrayArg(name: String, e: Expression): Seq[String] = e match {
    case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(st, _))
        if st.isInstanceOf[org.apache.spark.sql.types.StringType] =>
      v.toArray[org.apache.spark.unsafe.types.UTF8String](st)
        .map(s => if (s == null) null else s.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$name expects a literal array<string> argument, got $other")
  }

  private def floatArrayArg(name: String, e: Expression): Seq[Float] = e match {
    case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _)) =>
      v.toFloatArray().toSeq
    case other => throw new IllegalArgumentException(
      s"$name expects a literal array<float> argument, got $other")
  }

  private def longArg(name: String, e: Expression): Long = e match {
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal long argument, got $other")
  }

  private def longArrayArg(name: String, e: Expression): Seq[Long] = e match {
    case Literal(v: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, _)) =>
      v.toLongArray().toSeq
    case other => throw new IllegalArgumentException(
      s"$name expects a literal array<bigint> argument, got $other")
  }

  /** (name, builder) for every native expression. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot_f32" -> { args => DotProductF32(args(0), args(1)) },
    "graft_cosine_f32" -> { args => CosineSimF32(args(0), args(1)) },
    "graft_minhash_sig" -> { args =>
      MinHashSig(args(0), intArg("graft_minhash_sig", args(1)))
    },
    "graft_shingles" -> { args =>
      ShingleSet(args(0), intArg("graft_shingles", args(1)))
    },
    "graft_clean_text" -> { args => CleanAsciiText(args(0)) },
    "graft_simhash" -> { args =>
      SimHashFromHashes(args(0), intArg("graft_simhash", args(1)))
    },
    "graft_quantized_dot" -> { args => QuantizedDotF32(args(0), args(1)) },
    "graft_pq_encode" -> { args =>
      PqEncode(args(0), floatArrayArg("graft_pq_encode", args(1)),
        intArg("graft_pq_encode", args(2)), intArg("graft_pq_encode", args(3)))
    },
    "graft_sorted_intersect" -> { args => SortedIntersectCount(args(0), args(1)) },
    "graft_sparse_dot" -> { args =>
      SparseDotSorted(args(0), args(1), args(2), args(3))
    },
    "graft_bloom_might_contain" -> { args => BloomMightContain(args(0), args(1)) },
    "graft_unicode_normalize" -> { args =>
      UnicodeNormalize(args(0), stringArg("graft_unicode_normalize", args(1)))
    },
    "graft_dhash64" -> { args => DHash64(args(0)) },
    "graft_jaro_winkler" -> { args => JaroWinklerSim(args(0), args(1)) },
    "graft_replace_chain" -> { args =>
      ReplaceChain(args(0),
        stringArrayArg("graft_replace_chain", args(1)),
        stringArrayArg("graft_replace_chain", args(2)))
    },
    "graft_unigram_segment" -> { args =>
      UnigramSegment(args(0),
        stringArrayArg("graft_unigram_segment", args(1)),
        longArrayArg("graft_unigram_segment", args(2)),
        intArg("graft_unigram_segment", args(3)),
        longArg("graft_unigram_segment", args(4)))
    },
    "graft_byte_unicode" -> { args => ByteUnicodeMap(args(0)) },
    "graft_byte_unicode_inv" -> { args => ByteUnicodeUnmap(args(0)) },
  )

  /** Idempotent per-session registration (temp functions live in the
    * session's own registry, so each new session registers again). */
  def ensureRegistered(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      if (!spark.catalog.functionExists(name))
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Dot product of two float-array columns (native, codegen'd). */
  def dotF32(df: org.apache.spark.sql.DataFrame, a: Column, b: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_dot_f32", a, b)
  }

  /** Cosine similarity of two float-array columns (native, codegen'd). */
  def cosineF32(df: org.apache.spark.sql.DataFrame, a: Column, b: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_cosine_f32", a, b)
  }

  /** MinHash signature (k longs) of a distinct-shingle string array. */
  def minhashSig(df: org.apache.spark.sql.DataFrame, shingles: Column, k: Int): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_minhash_sig", shingles, lit(k))
  }

  /** Distinct word n-gram shingles of a token array (native). */
  def shingles(df: org.apache.spark.sql.DataFrame, tokens: Column, n: Int): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_shingles", tokens, lit(n))
  }

  /** Single-pass `[a-z0-9 ]`-keep + space-collapse + trim of an
    * already-lowercased string (native). */
  def cleanText(df: org.apache.spark.sql.DataFrame, c: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_clean_text", c)
  }

  /** Fused int8 quantize + integer dot vs pre-quantized query codes
    * (native): struct(dot_q, scale). */
  def quantizedDot(df: org.apache.spark.sql.DataFrame, vec: Column, qCodes: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_quantized_dot", vec, qCodes)
  }

  /** Merge-walk intersection size of two sorted-ascending long arrays
    * (native). */
  def sortedIntersect(df: org.apache.spark.sql.DataFrame, a: Column, b: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_sorted_intersect", a, b)
  }

  /** Jaro–Winkler similarity of two string columns in [0, 1] (native,
    * codegen'd; DuckDB-parity semantics — see the expression doc). */
  def jaroWinkler(df: org.apache.spark.sql.DataFrame, a: Column, b: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_jaro_winkler", a, b)
  }

  /** All m PQ sub-centroid assignments of a float vector in one
    * runtime loop over the flattened row-major m x k x dsub codebook
    * (native; plan size constant in the codebook size). */
  def pqEncode(df: org.apache.spark.sql.DataFrame, vec: Column,
      codebooks: Seq[Seq[Array[Float]]]): Column = {
    ensureRegistered(df.sparkSession)
    val m = codebooks.length
    require(m > 0 && codebooks.forall(_.length == codebooks.head.length),
      "codebooks must be a non-empty rectangular m x k table")
    val k = codebooks.head.length
    val flat = codebooks.flatten.flatten.toArray
    call_function("graft_pq_encode", vec, lit(flat), lit(m), lit(k))
  }

  /** Merge-walk sparse dot product over two (sorted-ascending key
    * array, index-aligned value array) vectors (native). */
  def sparseDot(df: org.apache.spark.sql.DataFrame,
      keysA: Column, valsA: Column, keysB: Column, valsB: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_sparse_dot", keysA, valsA, keysB, valsB)
  }

  /** Bloom-filter membership probe over a serialized sketch (native;
    * bigint or string key). */
  def bloomMightContain(
      df: org.apache.spark.sql.DataFrame,
      key: Column,
      filterBytes: Array[Byte]): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_bloom_might_contain", key, lit(filterBytes))
  }

  /** Unicode normalization (UAX #15; form NFC | NFD | NFKC | NFKD) of
    * a string column (native). */
  def unicodeNormalize(
      df: org.apache.spark.sql.DataFrame,
      c: Column,
      form: String = "NFC"): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_unicode_normalize", c, lit(form))
  }

  /** dHash-style 64-bit perceptual signature of a binary payload
    * (native, codegen'd). */
  def dhash64(df: org.apache.spark.sql.DataFrame, payload: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_dhash64", payload)
  }

  /** N sequential literal replaces as one native runtime loop — plan
    * size constant in the pattern count (native, codegen'd). */
  def replaceChain(
      df: org.apache.spark.sql.DataFrame,
      c: Column,
      searches: Seq[String],
      replacements: Seq[String]): Column = {
    ensureRegistered(df.sparkSession)
    import org.apache.spark.sql.functions.typedlit
    call_function("graft_replace_chain", c,
      typedlit(searches), typedlit(replacements))
  }

  /** width-bit SimHash of an array<bigint> of token hashes (native). */
  def simhash(df: org.apache.spark.sql.DataFrame, hashes: Column, width: Int): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_simhash", hashes, lit(width))
  }

  /** Viterbi segmentation of one word under a unigram-LM vocabulary —
    * the whole lattice DP as one compiled method, vocabulary in the
    * plan's reference array ([[UnigramSegment]]). */
  def unigramSegment(
      df: org.apache.spark.sql.DataFrame,
      w: Column,
      tokens: Seq[String],
      lps: Seq[Long],
      maxTokenLen: Int,
      lpUnk: Long): Column = {
    ensureRegistered(df.sparkSession)
    import org.apache.spark.sql.functions.typedlit
    call_function("graft_unigram_segment", w,
      typedlit(tokens), typedlit(lps), lit(maxTokenLen), lit(lpUnk))
  }

  /** Byte-level-BPE symbol form of a string: UTF-8 bytes each mapped
    * through [[ByteUnicode.Alphabet]] (native, codegen'd). */
  def byteUnicode(df: org.apache.spark.sql.DataFrame, c: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_byte_unicode", c)
  }

  /** Exact inverse of [[byteUnicode]] — NULL when any code point is
    * outside the 256-entry table (native, codegen'd). */
  def byteUnicodeInverse(
      df: org.apache.spark.sql.DataFrame, c: Column): Column = {
    ensureRegistered(df.sparkSession)
    call_function("graft_byte_unicode_inv", c)
  }

  /** 32-bit SimHash of an array<bigint> of token hashes (native). */
  def simhash32(df: org.apache.spark.sql.DataFrame, hashes: Column): Column =
    simhash(df, hashes, 32)

  /** 64-bit SimHash of an array<bigint> of token hashes (native). */
  def simhash64(df: org.apache.spark.sql.DataFrame, hashes: Column): Column =
    simhash(df, hashes, 64)
}

/** `spark.sql.extensions` injector — the SparkSessionExtensions route
  * for cluster deployments where the session is built once:
  * every native function is available to SQL and `call_function`
  * without any per-session code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
        builder))
    }
}
