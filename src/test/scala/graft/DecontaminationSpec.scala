package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.Corpus
import graft.testkit.SparkTestKit._

/** Train/test decontamination and repetition quality metrics
  * (SURVEY.md §2.8). */
class DecontaminationSpec extends AnyFunSuite {

  test("contaminationReport: counts distinct test n-grams present in train") {
    val train = table("id bigint, text string", Seq(
      row(1L, "the quick brown fox jumps"),
      row(2L, "lazy dog sleeps all day")))
    val test = table("id bigint, text string", Seq(
      row(10L, "the quick brown fox"), // grams: 2, both in train
      row(11L, "cats chase red dots"),  // grams: 2, none in train
      row(12L, "xy")))                  // < 3 tokens -> 0 grams
    val out = Corpus.contaminationReport(train, "text", test, "id", "text", 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (10L, 2, 2L, 1.0),
      (11L, 2, 0L, 0.0),
      (12L, 0, 0L, 0.0)))
  }

  test("contaminationReport counts each distinct gram once despite train repeats") {
    val train = table("id bigint, text string", Seq(
      row(1L, "a b c a b c a b c"))) // gram a_b_c appears 3x (and others)
    val test = table("id bigint, text string", Seq(row(9L, "a b c")))
    val out = Corpus.contaminationReport(train, "text", test, "id", "text", 3)
      .head()
    assert(out.getInt(1) == 1 && out.getLong(2) == 1L && out.getDouble(3) == 1.0)
  }

  test("repetitionMetrics: dup-token and top-bigram fractions") {
    val df = table("id bigint, text string", Seq(
      row(1L, "a b a b a"), // 5 toks, 2 distinct; bigrams a_b x2, b_a x2
      row(2L, "x"),         // 1 token: no bigrams -> 0.0
      row(3L, "p q r s")))  // all distinct, each bigram once
    val m = TextFunctions.repetitionMetrics(col("text"))
    val rows = df.select(col("id"), m.getField("n_tokens"),
        m.getField("n_distinct_tokens"),
        m.getField("dup_token_frac"), m.getField("top_bigram_frac"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))
    assert(rows(0) == ((1L, 5, 2, 0.6, 0.5)))
    assert(rows(1) == ((2L, 1, 1, 0.0, 0.0)))
    assert(rows(2) == ((3L, 4, 4, 0.0, 1.0 / 3.0)))
  }

  test("nearDedupAgainstLedger: two-shard ingestion — within-shard reps, ledger contamination, ledger growth") {
    import graft.operators.Dedup
    // shard A: 1 and 2 are exact dups (one component, rep 1); 3 unique
    val shardA = table("doc_id bigint, text string", Seq(
      row(1L, "the quick brown fox jumps"),
      row(2L, "the quick brown fox jumps"),
      row(3L, "alpha beta gamma delta")))
    val step0 = Dedup.nearDedupAgainstLedger(shardA, "doc_id", "text",
      Dedup.emptySignatureLedger(spark))
    assert(step0.kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    assert(step0.ledger.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    // shard B against the grown ledger:
    //  10,11 = copies of doc 1's text  -> one component (rep 10),
    //          rep is ledger-contaminated -> component dropped whole
    //  12,13 = mutual copies, unseen    -> rep 12 kept, 13 dropped
    //  14    = doc 2's text             -> contaminated via doc 1 (J=1)
    //  15    = near-dup of doc 3 (adds one word: shingles 2/3 >= 0.5)
    //          -> contaminated FUZZILY, dropped
    //  16    = genuinely new            -> kept
    val shardB = table("doc_id bigint, text string", Seq(
      row(10L, "the quick brown fox jumps"),
      row(11L, "the quick brown fox jumps"),
      row(12L, "omega psi chi phi upsilon"),
      row(13L, "omega psi chi phi upsilon"),
      row(14L, "the quick brown fox jumps"),
      row(15L, "alpha beta gamma delta epsilon"),
      row(16L, "one two three four five six")))
    val step1 = Dedup.nearDedupAgainstLedger(shardB, "doc_id", "text",
      step0.ledger)
    assert(step1.kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(12L, 16L))
    // the returned ledger is cumulative: shard A survivors + shard B survivors
    assert(step1.ledger.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L, 12L, 16L))
    // kept frames carry the full shard payload (schema preserved)
    assert(step1.kept.columns.toSeq == shardB.columns.toSeq)
  }

  test("replayNearDupGate: stream micro-batches equal batch ledger decontamination") {
    import graft.operators.Dedup
    import graft.streaming.StreamGate
    val known = table("doc_id bigint, text string", Seq(
      row(1L, "the quick brown fox jumps"),
      row(2L, "alpha beta gamma delta")))
    val ledger = Dedup.signatureLedger(known, "doc_id", "text")
    val shard = table("doc_id bigint, text string", Seq(
      row(10L, "the quick brown fox jumps"),        // exact copy: dropped
      row(11L, "alpha beta gamma delta epsilon"),   // J = 2/3: dropped
      row(12L, "one two three four five"),          // fresh: kept
      row(13L, "six seven eight nine ten"),         // fresh: kept
      row(14L, "the quick brown fox jumps today"))) // J = 3/4: dropped
    // one file per trigger forces a multi-micro-batch replay — the
    // per-doc-independence claim is exercised, not assumed
    val got = StreamGate.replayNearDupGate(shard, "doc_id", "text", ledger,
        filesPerTrigger = 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(12L, 13L), got.toString)
    val batch = Dedup.dropNearDupsOfLedger(shard, "doc_id", "text", ledger)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(batch == got, s"stream $got != batch $batch")
  }

  test("removeDuplicatedSpans: cross-doc spans cut, intra-doc repeats immune, overlaps merge") {
    // n=3 dup grams (>= 2 DISTINCT docs): "a b c" (d1,d2,d4,d5),
    // "b c d" (d1,d5), "c d e" (d1,d5). d3 repeats its own grams only.
    val docs = table("doc_id bigint, text string", Seq(
      row(1L, "a b c d e"),
      row(2L, "x a b c y"),
      row(3L, "p q r p q r p q"),
      row(4L, "a b c"),
      row(5L, "a b c d e a b c")))
    val got = Corpus.removeDuplicatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (1L, 5, 5, ""),                      // starts 0,1,2 cover all
      (2L, 5, 3, "x y"),                   // interior span cut, ends kept
      (3L, 8, 0, "p q r p q r p q"),       // intra-doc repeats never cut
      (4L, 3, 3, ""),                      // whole doc = the dup gram
      (5L, 8, 8, "")),                     // overlapping spans merge 0-7
      got.toString)
    // hashed and literal gram keys agree
    val lit = Corpus.removeDuplicatedSpans(docs, "doc_id", "text", n = 3,
        hashGrams = false)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    assert(lit == got)
  }

  test("removeDuplicatedSpans: minDocs raises the duplication bar") {
    val docs = table("doc_id bigint, text string", Seq(
      row(1L, "a b c d e"),
      row(2L, "x a b c y"),
      row(3L, "p q r p q r p q"),
      row(4L, "a b c"),
      row(5L, "a b c d e a b c")))
    // minDocs=3: only "a b c" (4 docs) qualifies; the d1/d5-only pairs
    // "b c d"/"c d e" no longer cut
    val got = Corpus.removeDuplicatedSpans(docs, "doc_id", "text", n = 3,
        minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (1L, 5, 3, "d e"),
      (2L, 5, 3, "x y"),
      (3L, 8, 0, "p q r p q r p q"),
      (4L, 3, 3, ""),
      (5L, 8, 6, "d e")),
      got.toString)
    // short docs (< n tokens) contribute no grams and are never cut
    val shorty = table("doc_id bigint, text string", Seq(
      row(1L, "a b"), row(2L, "a b")))
    val s = Corpus.removeDuplicatedSpans(shorty, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    assert(s == Seq((1L, 2, 0, "a b"), (2L, 2, 0, "a b")), s.toString)
  }
}
