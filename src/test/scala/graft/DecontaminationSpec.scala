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
}
