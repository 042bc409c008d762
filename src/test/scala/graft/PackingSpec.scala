package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Dedup, General}
import graft.testkit.SparkTestKit._

/** Distributed prefix sum, sequence packing, and the cross-corpus
  * near-dup join (SURVEY.md §2.8). */
class PackingSpec extends AnyFunSuite {

  test("withRunningTotal: exclusive prefix sum in sort order, many partitions") {
    val df = table("k bigint, v int", (1L to 100L).map(i => row(i, i.toInt)))
      .repartition(7)
    val out = General.withRunningTotal(df, Seq("k"), "v", "pre")
      .orderBy("k").collect()
    out.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(2) == (k - 1) * k / 2, s"prefix at k=$k") // sum 1..k-1
    }
  }

  test("withRunningTotal matches the single-partition window formulation") {
    val df = table("k bigint, v int", Seq(
      row(3L, 10), row(1L, 5), row(2L, 7), row(4L, 1)))
    val got = General.withRunningTotal(df, Seq("k"), "v", "pre")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((1L, 0L), (2L, 5L), (3L, 12L), (4L, 22L)))
  }

  test("packSequences: seq_id from start offset over the token budget") {
    val df = table("doc_id bigint, text string", Seq(
      row(1L, "a b c"),      // start 0, seq 0
      row(2L, "d e"),        // start 3, seq 0
      row(3L, "f g h i"),    // start 5, seq 1
      row(4L, "j")))         // start 9, seq 2
    val got = Corpus.packSequences(df, "doc_id", "text", seqLen = 4L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 3L, 0L, 0L), (2L, 2L, 3L, 0L),
      (3L, 4L, 5L, 1L), (4L, 1L, 9L, 2L)))
  }

  test("crossCorpusNearDupPairs finds planted cross-corpus twins only") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val train = table("id bigint, text string", Seq(
      row(1L, base),
      row(2L, "completely different training content about spark engines"),
      row(3L, "yet another unrelated document in the training corpus")))
    val test = table("id bigint, text string", Seq(
      row(10L, base + " tail"), // near-dup of train 1
      row(11L, "novel evaluation prompt with no training overlap at all")))
    val got = Dedup.crossCorpusNearDupPairs(
        test, "id", "text", train, "id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 1L)))
  }
}
