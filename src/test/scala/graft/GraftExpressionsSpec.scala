package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftFunctions
import graft.functions.ArrayFunctions
import graft.testkit.SparkTestKit._

/** Native codegen expressions vs their composed higher-order-function
  * formulations: values must agree bit-for-bit (same IEEE ops in the
  * same order), null semantics must match zip_with's null propagation,
  * and minhash must satisfy the defining union property.
  */
class GraftExpressionsSpec extends AnyFunSuite {

  test("cosineF32/dotF32 agree bit-for-bit with the composed HOF formulation") {
    val rnd = new scala.util.Random(7)
    val rows64 = (0 until 50).map { i =>
      row(i.toLong,
        Seq.fill(64)(rnd.nextFloat() - 0.5f),
        Seq.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val df = table("id bigint, a array<float>, b array<float>", rows64)
    val both = df.select(
      GraftFunctions.cosineF32(df, col("a"), col("b")).as("native_cos"),
      ArrayFunctions.cosineSimilarity(col("a"), col("b")).as("hof_cos"),
      GraftFunctions.dotF32(df, col("a"), col("b")).as("native_dot"),
      ArrayFunctions.dotProduct(col("a"), col("b")).as("hof_dot")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "cosine bits differ")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "dot bits differ")
    }
  }

  test("cosineF32 null semantics: null input, unequal length, null element") {
    val df = table("a array<float>, b array<float>", Seq(
      row(null, Seq(1.0f)),
      row(Seq(1.0f, 2.0f), Seq(1.0f)),
      row(Seq(1.0f, null), Seq(1.0f, 2.0f)),
      row(Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))))
    val got = df.select(GraftFunctions.cosineF32(df, col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isEmpty && got(1).isEmpty && got(2).isEmpty)
    assert(math.abs(got(3).get - 1.0) < 1e-12)
  }

  test("minhashSig: width k, determinism, and the union property") {
    val df = table("id bigint, sh array<string>", Seq(
      row(1L, Seq("a_b_c", "b_c_d", "c_d_e")),
      row(2L, Seq("x_y_z", "b_c_d")),
      row(3L, Seq("a_b_c", "b_c_d", "c_d_e", "x_y_z"))))  // = 1 union 2
    val sigs = df.select(col("id"), GraftFunctions.minhashSig(df, col("sh"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.length == 32))
    // determinism across evaluations
    val again = df.select(col("id"), GraftFunctions.minhashSig(df, col("sh"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs == again)
    // defining property: sig(A ∪ B) = elementwise min(sig(A), sig(B))
    val unionSig = sigs(1L).zip(sigs(2L)).map { case (x, y) => math.min(x, y) }
    assert(sigs(3L) == unionSig)
    // empty shingle set -> all sentinel max values
    val empty = table("sh array<string>", Seq(row(Seq.empty[String])))
    val es = empty.select(GraftFunctions.minhashSig(empty, col("sh"), 8))
      .head().getSeq[Long](0)
    assert(es.forall(_ == Long.MaxValue))
  }

  test("shingles: native set equals the composed wordShingles set") {
    val df = table("id bigint, text string", Seq(
      row(1L, "the quick brown fox jumps over the quick brown fox"),
      row(2L, "a b"),           // fewer than n tokens -> empty
      row(3L, ""),              // empty text -> [\"\"] -> empty
      row(4L, "x y z")))
    val both = df.select(
      GraftFunctions.shingles(df, graft.functions.TextFunctions.tokens(col("text")), 3).as("nat"),
      graft.functions.TextFunctions.wordShingles(col("text"), 3).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0).toSet == r.getSeq[String](1).toSet)
    }
    // duplicate trigram appears once
    assert(both(0).getSeq[String](0).count(_ == "the_quick_brown") == 1)
    assert(both(1).getSeq[String](0).isEmpty && both(2).getSeq[String](0).isEmpty)
  }

  test("cleanText equals the two-regex normalize pipeline byte-for-byte") {
    val df = table("text string", Seq(
      row("The  Quick, Brown... FOX!!  "),
      row("   leading and trailing   "),
      row("tabs\tand\nnewlines"),
      row("unicode éü dropped"),
      row(""),
      row("...!!!...")))
    val both = df.select(
      GraftFunctions.cleanText(df, lower(col("text"))).as("nat"),
      graft.functions.TextFunctions.normalizeText(col("text")).as("regex"))
      .collect()
    both.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"native='${r.getString(0)}' regex='${r.getString(1)}'")
    }
  }

  test("cleanText equals the regex pipeline on 300 random strings (generative)") {
    val rnd = new scala.util.Random(99)
    val alphabet = "abz09AZ .,!?\t\n-_éü日本😀"
    val rows300 = (0 until 300).map { _ =>
      val len = rnd.nextInt(40)
      row((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = table("text string", rows300)
    val mismatches = df.select(
        GraftFunctions.cleanText(df, lower(col("text"))).as("nat"),
        graft.functions.TextFunctions.normalizeText(col("text")).as("regex"))
      .filter(col("nat") =!= col("regex"))
      .count()
    assert(mismatches == 0L)
  }

  test("native expressions survive both codegen and interpreted evaluation") {
    val df = table("a array<float>, b array<float>",
      Seq(row(Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))))
    val viaCodegen = df.select(GraftFunctions.dotF32(df, col("a"), col("b")))
      .head().getDouble(0)
    assert(viaCodegen == 32.0)
    // interpreted path: filter with the expression forces eval in
    // places codegen may not cover; also exercise via an aggregation
    val filtered = df.filter(GraftFunctions.dotF32(df, col("a"), col("b")) > 31.0).count()
    assert(filtered == 1L)
  }

  test("JaroWinklerSim: textbook vectors at DuckDB-parity doubles, nulls, codegen+interpreted") {
    // the exact doubles DuckDB's jaro_winkler_similarity returns for
    // these (verified against the oracle engine) — bit-parity is the
    // contract the q246 fuzzy-agreement oracle stands on
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.96111111111111114),
      ("DIXON", "DICKSONX", 0.81333333333333324),
      ("JELLYFISH", "SMELLYFISH", 0.89629629629629637),
      ("DWAYNE", "DUANE", 0.84000000000000008),
      ("CRANE", "CRATE", 0.90666666666666673),
      ("abcdefgh", "abzzzzzz", 0.5),            // jaro <= 0.7: NO boost
      ("abcdefghij", "abcdzzzzzz", 0.59999999999999998),
      ("abcd", "acbd", 0.92499999999999993),    // transposition + boost
      ("ab", "ba", 0.0),                        // window 0: no matches
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),                            // DuckDB's either-empty rule
      ("x", "", 0.0),
      // non-ASCII: the kernel is BYTE-wise like the oracle engine —
      // 'é' is two symbols, so café/cafe is the byte score 0.848…,
      // not the per-character 0.883…
      ("café", "cafe", 0.8483333333333334),
      ("müller", "muller", 0.8642857142857143))
    val df = table("a string, b string",
      cases.map { case (a, b, _) => row(a, b) })
    val got = df.select(
        GraftFunctions.jaroWinkler(df, col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, exp), g) =>
      assert(g == exp, s"JW($a, $b): got $g, oracle-parity $exp")
    }
    // interpreted path (filter) agrees with the projected codegen path
    val n = df.filter(
      GraftFunctions.jaroWinkler(df, col("a"), col("b")) >= 0.9).count()
    assert(n == cases.count(_._3 >= 0.9), n.toString)
    // NULL in -> NULL out
    val withNull = table("a string, b string", Seq(row(null, "x"), row("x", null)))
    assert(withNull.select(GraftFunctions.jaroWinkler(withNull, col("a"), col("b")))
      .collect().forall(_.isNullAt(0)))
  }

  test("BloomMightContain: interpreted eval matches the sketch; null key -> null") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.util.sketch.BloomFilter
    def ser(bf: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    // direct .eval() — the interpreted path codegen'd plans never take
    val bf = BloomFilter.create(100, 0.01)
    bf.putLong(42L); bf.putLong(7L)
    val e = graft.expressions.BloomMightContain(
      BoundReference(0, LongType, nullable = true),
      Literal(ser(bf), BinaryType))
    assert(e.eval(InternalRow(42L)) == true)
    assert(e.eval(InternalRow(7L)) == true)
    (0L until 200L).foreach { k =>
      assert(e.eval(InternalRow(k)) == bf.mightContainLong(k), s"key $k")
    }
    assert(e.eval(InternalRow(null)) == null)
    val bfs = BloomFilter.create(100, 0.01)
    bfs.putString("hello")
    val es = graft.expressions.BloomMightContain(
      BoundReference(0, StringType, nullable = true),
      Literal(ser(bfs), BinaryType))
    assert(es.eval(InternalRow(UTF8String.fromString("hello"))) == true)
    assert(es.eval(InternalRow(UTF8String.fromString("goodbye"))) ==
      bfs.mightContainString("goodbye"))
    assert(es.eval(InternalRow(null)) == null)
    // a NULL serialized filter is an analysis error, not a silent
    // row-dropper (interpreted) or a planning-time throw (codegen)
    val eNull = graft.expressions.BloomMightContain(
      BoundReference(0, LongType, nullable = true),
      Literal(null, BinaryType))
    assert(eNull.checkInputDataTypes().isFailure)
  }

  test("UnicodeNormalize: composed == decomposed under NFC; NFKC folds ligatures") {
    val df = table("s string", Seq(
      row("café"),          // composed e-acute
      row("café"),         // decomposed e + combining acute
      row("ﬁle"),           // 'fi' ligature + "le"
      row(null)))
    df.createOrReplaceTempView("norm_in")
    GraftFunctions.ensureRegistered(spark)
    val nfc = spark.sql(
      "SELECT graft_unicode_normalize(s, 'NFC') AS n FROM norm_in")
      .collect().map(r => Option(r.getString(0)))
    // both spellings of café normalize to the same bytes
    assert(nfc(0) == nfc(1) && nfc(0).contains("café"))
    assert(nfc(3).isEmpty) // null preserved
    val nfkc = spark.sql(
      "SELECT graft_unicode_normalize(s, 'NFKC') AS n FROM norm_in WHERE s IS NOT NULL")
      .collect().map(_.getString(0))
    assert(nfkc(2) == "file") // compatibility fold of the ligature
    // bad form is an analysis error
    intercept[Exception] {
      spark.sql("SELECT graft_unicode_normalize('x', 'NFX') FROM norm_in").collect()
    }
  }

  test("DHash64: recipe pins, interpreted==codegen, two instances share a codegen scope") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.BinaryType
    val e = graft.expressions.DHash64(BoundReference(0, BinaryType, nullable = true))
    // hand-computed recipe pins (the 8x9-grid gradient rule):
    //  - empty payload -> 0 (documented degenerate case)
    //  - constant payload -> 0 (no gradients anywhere)
    //  - [10,30,20] (len<72, cells repeat bytes): cell g reads byte
    //    g/24, so the only rising edge is g=23->24 (10<30); g=23 is
    //    (r=2,c=5) -> bit 2*8+5 = 21. The 30->20 edge at g=47 falls.
    //  - 0..255 ramp: offsets (g*256)/72 strictly increase, bytes
    //    strictly increase (unsigned), so all 64 bits set.
    assert(e.eval(InternalRow(Array.emptyByteArray)) == 0L)
    assert(e.eval(InternalRow(Array.fill[Byte](7)(42))) == 0L)
    assert(e.eval(InternalRow(Array[Byte](10, 30, 20))) == (1L << 21))
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    assert(e.eval(InternalRow(ramp)) == -1L)
    assert(e.eval(InternalRow(null)) == null)
    // interpreted (eval above) vs codegen must agree bit-for-bit, and
    // TWO instances in ONE codegen scope must not collide on Java
    // locals (the ctx.freshName regression: duplicate declarations fail
    // Janino compilation outright at this layer — no silent fallback).
    val proj = GenerateUnsafeProjection.generate(Seq(e,
      graft.expressions.DHash64(BoundReference(0, BinaryType, nullable = true))))
    Seq(Array.emptyByteArray, Array.fill[Byte](7)(42),
        Array[Byte](10, 30, 20), ramp).foreach { payload =>
      val out = proj(InternalRow(payload))
      assert(out.getLong(0) == e.eval(InternalRow(payload)),
        s"codegen != interpreted for len=${payload.length}")
      assert(out.getLong(1) == out.getLong(0))
    }
  }

  test("ReplaceChain: step semantics == nested replace fold, interpreted==codegen, table validated") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.ReplaceChain
    val in = BoundReference(0, StringType, nullable = true)
    // Reference semantics: the same table applied as k sequential
    // String.replace steps (literal, non-overlapping, left-to-right —
    // the builtin `replace` contract ReplaceChain must match).
    def foldRef(s: String, tbl: Seq[(String, String)]): String =
      tbl.foldLeft(s) { case (acc, (a, b)) => acc.replace(a, b) }
    val tbl = Seq(" a  b " -> " ab ", " ab  c " -> " abc ", "x" -> "yy", "yy" -> "z")
    val e = ReplaceChain(in, tbl.map(_._1), tbl.map(_._2))
    val inputs = Seq(
      " a  b  c ",      // cascades: (a,b) enables (ab,c)
      " c  a  b ",      // (a,b) applies, (ab,c) does not (order matters)
      "xxx",            // sequential: x->yy then yy->z LEFT TO RIGHT
      " a  b  a  b ",   // non-overlapping multi-occurrence
      "")               // empty input passes through
    inputs.foreach { s =>
      val got = e.eval(InternalRow(UTF8String.fromString(s)))
      assert(got.toString == foldRef(s, tbl), s"input '$s'")
    }
    assert(e.eval(InternalRow(null)) == null)
    // empty table = identity
    val id = ReplaceChain(in, Nil, Nil)
    assert(id.eval(InternalRow(UTF8String.fromString("abc"))).toString == "abc")
    // interpreted vs codegen bit-for-bit, two instances one scope
    val proj = GenerateUnsafeProjection.generate(Seq(e,
      ReplaceChain(in, tbl.map(_._1), tbl.map(_._2))))
    inputs.foreach { s =>
      val out = proj(InternalRow(UTF8String.fromString(s)))
      assert(out.getUTF8String(0).toString == foldRef(s, tbl), s"codegen '$s'")
      assert(out.getUTF8String(1).toString == out.getUTF8String(0).toString)
    }
    // construction-time validation: ragged table, empty search pattern
    intercept[IllegalArgumentException](ReplaceChain(in, Seq("a"), Nil))
    intercept[IllegalArgumentException](ReplaceChain(in, Seq(""), Seq("x")))
    intercept[IllegalArgumentException](ReplaceChain(in, Seq("a"), Seq(null)))
  }

  test("every native expression survives duplicate instances over NON-nullable children") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    // With a null guard, nullSafeCodeGen brace-scopes each instance's
    // locals; with NON-nullable children it emits the body bare, so two
    // instances of an expression with fixed-named locals redefine them
    // and Janino rejects the whole generated class (observed round 11:
    // "Redefinition of local variable n$" for 2x CosineSimF32) — which
    // at the plan layer is a SILENT fallback to interpreted eval. Every
    // local-declaring expression must allocate via ctx.freshName; this
    // projection would fail to compile otherwise (no fallback at this
    // layer).
    def exprs = {
      import graft.expressions._
      val fArr = BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = false)
      val iArr = BoundReference(1, ArrayType(IntegerType, containsNull = false), nullable = false)
      val sArr = BoundReference(2, ArrayType(StringType, containsNull = false), nullable = false)
      val lArr = BoundReference(3, ArrayType(LongType, containsNull = false), nullable = false)
      val str = BoundReference(4, StringType, nullable = false)
      val bin = BoundReference(5, BinaryType, nullable = false)
      val dArr = BoundReference(6, ArrayType(DoubleType, containsNull = false), nullable = false)
      Seq(
        DotProductF32(fArr, fArr), CosineSimF32(fArr, fArr),
        QuantizedDotF32(fArr, iArr), MinHashSig(sArr, 4), ShingleSet(sArr, 2),
        SimHashFromHashes(lArr, 32), CleanAsciiText(str),
        UnicodeNormalize(str, "NFC"), DHash64(bin),
        ReplaceChain(str, Seq("Quick", "The"), Seq("Slow", "A")),
        SparseDotSorted(lArr, dArr, lArr, dArr),
        PqEncode(fArr, Seq(1f, 0f, 0f, 0f, 1f, 1f), m = 1, k = 2),
        JaroWinklerSim(str, str))
    }
    val both = exprs ++ exprs // two fresh instance sets, one codegen scope
    val proj = GenerateUnsafeProjection.generate(both)
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f)),
      ArrayData.toArrayData(Array(1, -2, 3)),
      new GenericArrayData(Array[Any](
        UTF8String.fromString("a_b"), UTF8String.fromString("b_c"),
        UTF8String.fromString("a_b"))),
      ArrayData.toArrayData(Array(3L, 5L, 0L)),
      UTF8String.fromString("The  Quick 9"),
      "abc".getBytes("UTF-8"),
      ArrayData.toArrayData(Array(0.5, -1.5, 2.0)))
    val out = proj(row)
    val k = exprs.length
    // both instance sets compute identical values (spot-check scalars)
    assert(out.getDouble(0) == out.getDouble(k))     // dot
    assert(out.getDouble(1) == out.getDouble(k + 1)) // cosine
    assert(out.getLong(5) == out.getLong(k + 5))     // simhash
    assert(out.getLong(8) == out.getLong(k + 8))     // dhash
    // and they agree with interpreted eval
    assert(out.getDouble(0) == exprs.head.eval(row).asInstanceOf[Double])
  }

  test("SparseDotSorted: hand-computed merge dot, disjoint, nulls, misalignment") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    import graft.expressions.SparseDotSorted
    val ka = BoundReference(0, ArrayType(LongType), nullable = true)
    val va = BoundReference(1, ArrayType(DoubleType), nullable = true)
    val kb = BoundReference(2, ArrayType(LongType), nullable = true)
    val vb = BoundReference(3, ArrayType(DoubleType), nullable = true)
    val e = SparseDotSorted(ka, va, kb, vb)
    def arr(xs: Any*): ArrayData = new GenericArrayData(xs.toArray[Any])
    def rowOf(a: ArrayData, b: ArrayData, c: ArrayData, d: ArrayData) =
      InternalRow(a, b, c, d)
    // shared keys 3 and 9: 2.0*5.0 + 0.5*(-2.0) = 9.0
    val r = rowOf(arr(1L, 3L, 9L), arr(7.0, 2.0, 0.5),
      arr(3L, 8L, 9L), arr(5.0, 1.0, -2.0))
    assert(e.eval(r) == 9.0)
    // disjoint -> 0.0 (a real zero, not null)
    assert(e.eval(rowOf(arr(1L), arr(1.0), arr(2L), arr(1.0))) == 0.0)
    // empty side -> 0.0
    assert(e.eval(rowOf(arr(), arr(), arr(1L), arr(1.0))) == 0.0)
    // null input -> null; a VISITED null element -> null (one past the
    // shorter side is never visited — SortedIntersectCount's contract)
    assert(e.eval(rowOf(null, arr(1.0), arr(1L), arr(1.0))) == null)
    assert(e.eval(rowOf(arr(null, 1L), arr(1.0, 1.0), arr(1L), arr(1.0))) == null)
    // misaligned keys/values fail loudly, never truncate the walk
    val mis = intercept[IllegalArgumentException] {
      e.eval(rowOf(arr(1L, 2L), arr(1.0), arr(1L), arr(1.0)))
    }
    assert(mis.getMessage.contains("index-aligned"))
    // interpreted == codegen on the hand-computed row
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    assert(proj(r).getDouble(0) == 9.0)
  }

  test("extensions injector wires every builder; registration is idempotent") {
    // the SparkSessionExtensions route (cluster deployments set
    // spark.sql.extensions=graft.expressions.GraftExtensions); here we
    // drive the injector against a fresh extensions container
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.expressions.GraftExtensions().apply(ext) // must not throw
    val names = GraftFunctions.builders.map(_._1)
    assert(names.distinct.size == names.size)
    assert(names.toSet == Set("graft_dot_f32", "graft_cosine_f32",
      "graft_minhash_sig", "graft_shingles", "graft_clean_text", "graft_simhash",
      "graft_quantized_dot", "graft_sorted_intersect", "graft_sparse_dot",
      "graft_pq_encode", "graft_bloom_might_contain",
      "graft_unicode_normalize", "graft_dhash64", "graft_replace_chain",
      "graft_jaro_winkler", "graft_unigram_segment",
      "graft_byte_unicode", "graft_byte_unicode_inv"))
    // per-session registration: repeated calls are safe, functions resolve
    GraftFunctions.ensureRegistered(spark)
    GraftFunctions.ensureRegistered(spark)
    names.foreach(n => assert(spark.catalog.functionExists(n), n))
  }

  test("sql surface: registered functions resolve from spark.sql") {
    val df = table("a array<float>", Seq(row(Seq(1.0f, 0.0f))))
    GraftFunctions.ensureRegistered(spark)
    df.createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT graft_cosine_f32(a, array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c FROM vecs")
      .head().getDouble(0)
    assert(math.abs(out - 1.0) < 1e-12)
  }
}
