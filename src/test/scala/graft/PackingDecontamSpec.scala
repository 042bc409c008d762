package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.Corpus
import graft.testkit.SparkTestKit._

/** Round-19 extension families (SURVEY.md §2.8): Gopher structural
  * repetition rules, whole-document FFD packing + padding readout, and
  * exact shared-substring decontamination with offsets. */
class PackingDecontamSpec extends AnyFunSuite {

  // ---------------------------------------------------- Gopher rules

  test("structural repetition: planted dup lines and paragraphs") {
    val docs = table("id bigint, text string", Seq(
      row(1L, "aa bb\ncc dd\naa bb\nee"),           // line 'aa bb' dup
      row(2L, "pp qq\nrr\n\npp qq\nrr\n\nss"),      // paragraph dup
      row(3L, "xx\nyy\nzz"),                        // clean
      row(4L, ""),                                  // empty
      row(5L, "solo")))                             // single line
    val m = docs.select(col("id"),
        TextFunctions.structuralRepetitionMetrics(col("text")).as("m"))
      .orderBy("id").collect().map(_.getStruct(1))
    // doc 1: 4 lines, 3 distinct; dup occurrence 'aa bb' = 5 of 17 chars
    assert(m(0).getAs[Int]("n_lines") == 4)
    assert(m(0).getAs[Int]("n_distinct_lines") == 3)
    assert(m(0).getAs[Double]("dup_line_frac") == 0.25)
    assert(m(0).getAs[Double]("dup_line_char_frac") == 5.0 / 17.0)
    assert(m(0).getAs[Int]("n_paragraphs") == 1, "no blank line = one para")
    assert(m(0).getAs[Double]("dup_paragraph_frac") == 0.0)
    // doc 2: paragraphs [pp qq\nrr, pp qq\nrr, ss] -> 3 paras 2 distinct
    assert(m(1).getAs[Int]("n_paragraphs") == 3)
    assert(m(1).getAs[Int]("n_distinct_paragraphs") == 2)
    assert(m(1).getAs[Double]("dup_paragraph_frac") == 1.0 / 3.0)
    // its 6 LINES (pp qq, rr twice each, ss): 5... lines are split on
    // single \n so: pp qq, rr, pp qq, rr, ss -> 5 lines 3 distinct
    assert(m(1).getAs[Int]("n_lines") == 5)
    assert(m(1).getAs[Int]("n_distinct_lines") == 3)
    // doc 3 clean, doc 4 empty -> all zero, doc 5 single line
    assert(m(2).getAs[Double]("dup_line_frac") == 0.0)
    assert(m(3).getAs[Int]("n_lines") == 0)
    assert(m(3).getAs[Double]("dup_line_char_frac") == 0.0)
    assert(m(4).getAs[Int]("n_lines") == 1)
  }

  test("structural repetition: char fraction catches long dup lines") {
    // one SHORT unique line + two copies of a LONG line: count frac
    // 1/3 but char frac dominated by the long line
    val docs = table("text string",
      Seq(row("x\nthis line is long and repeated\nthis line is long and repeated")))
    val m = docs.select(
        TextFunctions.structuralRepetitionMetrics(col("text")).as("m"))
      .head().getStruct(0)
    assert(m.getAs[Double]("dup_line_frac") == 1.0 / 3.0)
    val longLen = "this line is long and repeated".length
    assert(m.getAs[Double]("dup_line_char_frac") ==
      longLen.toDouble / (1 + 2 * longLen).toDouble)
  }

  // ------------------------------------------------------ FFD packer

  test("FFD: capacity respected, largest-first, first fit, 1-based bins") {
    val docs = table("id string, n bigint", Seq(
      row("a", 7L), row("b", 6L), row("c", 4L), row("d", 3L), row("e", 2L)))
    val got = Corpus.packFirstFitDecreasing(docs, "id", "n",
        seqLen = 10L, numShards = 1)
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq
    // sorted desc: 7,6,4,3,2 -> bins: 7+3, 6+4, 2
    assert(got == Seq(("a", 7L, 1), ("b", 6L, 2), ("c", 4L, 2),
      ("d", 3L, 1), ("e", 2L, 3)))
    val rep = Corpus.binPaddingReport(
        Corpus.packFirstFitDecreasing(docs, "id", "n", 10L, 1),
        "shard", "bin", "n", 10L)
      .orderBy("bin").collect()
    assert(rep.map(_.getAs[Long]("fill")).toSeq == Seq(10L, 10L, 2L))
    assert(rep.map(_.getAs[Long]("padding")).toSeq == Seq(0L, 0L, 8L))
    assert(rep.map(_.getAs[Double]("utilization")).toSeq ==
      Seq(1.0, 1.0, 0.2))
  }

  test("FFD: partitioning-invariant and capacity-safe on a big fixture") {
    val rows = (1 to 400).map(i => row(i.toLong, (i * 37 % 90 + 10).toLong))
    val docs = table("id bigint, n bigint", rows)
    val a = Corpus.packFirstFitDecreasing(docs, "id", "n", 128L, 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Corpus.packFirstFitDecreasing(docs.repartition(13), "id", "n",
        128L, 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b, "assignment must not depend on input partitioning")
    val fills = Corpus.binPaddingReport(
        Corpus.packFirstFitDecreasing(docs, "id", "n", 128L, 3),
        "shard", "bin", "n", 128L)
      .collect()
    assert(fills.forall(_.getAs[Long]("overflow") == 0L),
      "FFD must never overflow a bin")
    assert(fills.forall(_.getAs[Long]("fill") <= 128L))
  }

  test("FFD beats the naive whole-doc packer on skewed lengths") {
    // skewed: a few near-capacity docs + many small ones. Naive
    // one-doc-per-padded-sequence (the q144 'padded' baseline) burns
    // ~half the budget; FFD packs the small docs into the gaps.
    val rows = (1 to 20).map(i => row(i.toLong, 70L)) ++
      (21 to 80).map(i => row(i.toLong, 9L))
    val docs = table("id bigint, n bigint", rows)
    val rep = Corpus.binPaddingReport(
        Corpus.packFirstFitDecreasing(docs, "id", "n", 100L, 1),
        "shard", "bin", "n", 100L).collect()
    val bins = rep.length
    val waste = rep.map(_.getAs[Long]("padding")).sum
    val total = 20 * 70L + 60 * 9L
    // naive per-doc padding: one 100-budget sequence per doc = 80 bins
    assert(bins < 80 / 2, s"FFD used $bins bins vs 80 naive")
    // utilization above 90%: waste under 10% of used budget
    assert(waste.toDouble / (bins * 100.0) < 0.1,
      s"FFD wasted $waste of ${bins * 100}")
    assert(total + waste == bins * 100L, "fill + padding must cover bins")
  }

  test("FFD guards: over-budget doc, duplicate id, NULL id all loud") {
    val over = table("id string, n bigint", Seq(row("a", 11L)))
    val e1 = intercept[IllegalArgumentException] {
      Corpus.packFirstFitDecreasing(over, "id", "n", 10L, 1)
    }
    assert(e1.getMessage.contains("count > seqLen"))
    val dup = table("id string, n bigint", Seq(row("a", 1L), row("a", 2L)))
    val e2 = intercept[IllegalArgumentException] {
      Corpus.packFirstFitDecreasing(dup, "id", "n", 10L, 1)
    }
    assert(e2.getMessage.contains("duplicate id"))
    val nul = table("id string, n bigint", Seq(row(null, 1L)))
    val e3 = intercept[IllegalArgumentException] {
      Corpus.packFirstFitDecreasing(nul, "id", "n", 10L, 1)
    }
    assert(e3.getMessage.contains("NULL"))
  }

  // -------------------------------------- exact shared-substring spans

  private def spans(
      left: Seq[(Long, String)],
      right: Seq[(Long, String)],
      l: Int): Set[(Long, Long, Long, Long, Long)] = {
    val lf = table("id bigint, text string", left.map(p => row(p._1, p._2)))
    val rf = table("id bigint, text string", right.map(p => row(p._1, p._2)))
    Corpus.exactSubstringSpans(lf, "id", "text", rf, "id", "text", l)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
  }

  test("spans: exact offsets, maximality, below-threshold silence") {
    // shared run 'c d e f g' (5 tokens) sits at pos 3 in left, 2 in right
    val left = Seq((1L, "a b c d e f g h"))
    val right = Seq((10L, "z c d e f g q r"))
    assert(spans(left, right, 5) == Set((1L, 10L, 3L, 2L, 5L)))
    assert(spans(left, right, 6).isEmpty, "5-run must not appear at L=6")
    // maximality: reported ONCE with the full length, not per anchor
    assert(spans(Seq((1L, "a b c d e f g h")),
      Seq((2L, "a b c d e f g h")), 4) == Set((1L, 2L, 1L, 1L, 8L)))
  }

  test("spans: boundary runs, multiple diagonals, intra-doc repeats") {
    // run at the very START of left and END of right (extension stops
    // at both doc boundaries)
    assert(spans(Seq((1L, "p q r s t u")), Seq((2L, "x y p q r s")), 4) ==
      Set((1L, 2L, 1L, 3L, 4L)))
    // right doc contains the run TWICE -> two spans, two offsets
    assert(spans(Seq((1L, "m n o p")), Seq((2L, "m n o p z z m n o p")), 4)
      == Set((1L, 2L, 1L, 1L, 4L), (1L, 2L, 1L, 7L, 4L)))
  }

  test("spans: agrees with brute force on a cross-product fixture") {
    def bruteMax(a: Array[String], b: Array[String], l: Int) = {
      val out = scala.collection.mutable.Set
        .empty[(Long, Long, Long)]
      for (i <- a.indices; j <- b.indices
           if a(i) == b(j) && (i == 0 || j == 0 || a(i - 1) != b(j - 1))) {
        var k = 0
        while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k))
          k += 1
        if (k >= l) out += ((i + 1L, j + 1L, k.toLong))
      }
      out.toSet
    }
    val ls = Seq((1L, "u v w a b c d x y"), (2L, "a b c d u v w"))
    val rs = Seq((10L, "h a b c d k u v w a b"), (11L, "u v w a b c"))
    val expect = (for ((li, lt) <- ls; (ri, rt) <- rs;
        (lp, rp, len) <- bruteMax(lt.split(" "), rt.split(" "), 3))
      yield (li, ri, lp, rp, len)).toSet
    assert(spans(ls, rs, 3) == expect)
  }

  test("removeSpansAt: cuts exactly the covered positions") {
    val docs = table("id bigint, text string", Seq(
      row(1L, "a b c d e f g h"),
      row(2L, "u v w x y"),      // no spans -> untouched
      row(3L, "q r s t")))       // fully covered -> empty
    val spans = table("rid bigint, st bigint, ln bigint", Seq(
      row(1L, 3L, 2L),           // cut c d
      row(1L, 6L, 2L),           // cut f g
      row(1L, 2L, 2L),           // overlaps: cut b c (with first span)
      row(3L, 1L, 4L)))
    val got = Corpus.removeSpansAt(docs, "id", "text", spans,
        "rid", "st", "ln")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got(0) == ((1L, 8, 5, "a e h")))
    assert(got(1) == ((2L, 5, 0, "u v w x y")))
    assert(got(2) == ((3L, 4, 4, "")))
  }

  test("removeSpansAt closes the loop: detect then cut kills the overlap") {
    val left = table("id bigint, text string",
      Seq(row(1L, "p q shared run of five x")))
    val right = table("id bigint, text string",
      Seq(row(2L, "start shared run of five end tail")))
    val spans = Corpus.exactSubstringSpans(left, "id", "text",
      right, "id", "text", minTokens = 4)
    val cleaned = Corpus.removeSpansAt(right, "id", "text", spans,
      "right_id", "right_start", "span_len")
    val r = cleaned.head()
    assert(r.getAs[String]("cleaned_text") == "start end tail")
    // and re-detecting on the cleaned text finds nothing
    val cleanedRight = table("id bigint, text string",
      Seq(row(2L, r.getAs[String]("cleaned_text"))))
    val again = Corpus.exactSubstringSpans(left, "id", "text",
      cleanedRight, "id", "text", minTokens = 4)
    assert(again.count() == 0L)
  }

  test("exact-substring gate: batch drops leaks; stream replay == batch") {
    val bench = table("id bigint, text string", Seq(
      row(100L, "alpha beta gamma delta epsilon zeta"),
      row(101L, "one two three four five six")))
    val docs = table("id bigint, text string", Seq(
      row(1L, "x alpha beta gamma delta y"),     // 4-run leak -> drop
      row(2L, "clean doc with its own words"),
      row(3L, "y one two three four z"),         // 4-run leak -> drop
      row(4L, "three four five but only a trio"))) // 3-run < L -> keep
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    val batch = Corpus.dropExactSubstringMatches(docs, "id", "text",
      bench, "id", "text", minTokens = 4)
    assert(ids(batch) == Set(2L, 4L))
    val stream = graft.streaming.StreamGate.replayExactSubstringGate(
      docs.repartition(3), "id", "text", bench, "id", "text", minTokens = 4,
      filesPerTrigger = 1)
    assert(ids(stream) == Set(2L, 4L), "stream survivors must equal batch")
  }

  // -------------------------------------------- Gopher line rules

  test("gopherLineRules: bullets, ellipses, symbols, alpha words") {
    val docs = table("id bigint, text string", Seq(
      row(1L, "- item one\n- item two\nplain line"),
      row(2L, "first part...\nsecond...\nthird"),
      row(3L, "# one # two 42 99"),
      row(4L, "")))
    val got = docs.select(col("id"),
        TextFunctions.gopherLineRules(col("text")).as("m"))
      .orderBy("id").collect().map(_.getStruct(1))
    assert(got(0).getAs[Double]("bullet_line_frac") == 2.0 / 3.0)
    assert(got(0).getAs[Double]("ellipsis_line_frac") == 0.0)
    assert(got(1).getAs[Double]("ellipsis_line_frac") == 2.0 / 3.0)
    // doc 3: 2 hashes, 0 dot runs, 6 words; 2 alpha of 6
    assert(got(2).getAs[Int]("n_words") == 6)
    assert(got(2).getAs[Double]("symbol_word_ratio") == 2.0 / 6.0)
    assert(got(2).getAs[Double]("alpha_word_frac") == 2.0 / 6.0)
    // empty doc: zero lines, fractions 0; one empty word, 0 alpha
    assert(got(3).getAs[Int]("n_lines") == 0)
    assert(got(3).getAs[Double]("bullet_line_frac") == 0.0)
    assert(got(3).getAs[Double]("alpha_word_frac") == 0.0)
  }

  test("gopherLineRules: dot runs count non-overlapping, unicode ellipsis") {
    val docs = table("text string",
      Seq(row("wait...... what…\nok")))
    val m = docs.select(TextFunctions.gopherLineRules(col("text")).as("m"))
      .head().getStruct(0)
    // '......' = two non-overlapping '...' runs; words are SPACE-split
    // ('what…\nok' is one token), so 2 symbols over 2 words
    assert(m.getAs[Int]("n_words") == 2)
    assert(m.getAs[Double]("symbol_word_ratio") == 1.0)
    // line 1 ends with the unicode ellipsis
    assert(m.getAs[Double]("ellipsis_line_frac") == 0.5)
  }

  test("spans: hot anchor gram fails loudly count-first") {
    val many = table("id bigint, text string",
      (1L to 30L).map(i => row(i, "same five token run here")))
    val one = table("id bigint, text string",
      Seq(row(100L, "same five token run here")))
    val e = intercept[Exception] {
      Corpus.exactSubstringSpans(one, "id", "text", many, "id", "text",
        minTokens = 5, maxPositionsPerGram = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxPositionsPerGram")), msgs(e))
  }
}
