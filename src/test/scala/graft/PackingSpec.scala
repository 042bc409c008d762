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

  test("withRunningTotals: one pass equals k sequential single-column prefixes") {
    val df = table("k bigint, a int, b int, c int",
      (1L to 200L).map(i => row(i, i.toInt, (i % 7).toInt, (3 * i % 11).toInt)))
      .repartition(7)
    val multi = General.withRunningTotals(df, Seq("k"),
        Seq("a", "b", "c"), Seq("pa", "pb", "pc"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
    val single = Seq("a", "b", "c").map { c =>
      General.withRunningTotal(df, Seq("k"), c, "p")
        .orderBy("k").collect()
        .map(r => r.getLong(0) -> r.getLong(4)).toMap
    }
    multi.foreach { case (k, pa, pb, pc) =>
      assert(pa == single(0)(k) && pb == single(1)(k) && pc == single(2)(k),
        s"k=$k")
    }
    // arity mismatch is loud
    intercept[IllegalArgumentException] {
      General.withRunningTotals(df, Seq("k"), Seq("a", "b"), Seq("pa"))
    }
  }

  test("withPrevValue: lag in sort order across many partitions, empty-safe") {
    val df = table("k bigint, v double",
      (1L to 100L).map(i => row(i, i.toDouble * 0.5)))
      .repartition(7)
    val out = General.withPrevValue(df, Seq("k"), "v", "pv")
      .orderBy("k").collect()
    assert(out.head.isNullAt(2), "first row has no prev")
    out.tail.foreach { r =>
      val k = r.getLong(0)
      assert(r.getDouble(2) == (k - 1).toDouble * 0.5, s"prev at k=$k")
    }
    // more partitions than rows: the seed carry crosses empty partitions
    val sparse = table("k bigint, v double",
      Seq(row(10L, 1.0), row(20L, 2.0))).repartition(8)
    val got = General.withPrevValue(sparse, Seq("k"), "v", "pv")
      .orderBy("k").collect().map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(got.toSeq == Seq(None, Some(1.0)))
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

  test("interleaveBySource: stride order, proportional prefixes, determinism") {
    // 2:1 weights — source a's finish times r/2, b's r/1: the merged
    // order is a,a,b,a,a,b,... (ties a before b by source tie-break:
    // a's rank-2k time k equals b's rank-k time k)
    val df = table("src string, id bigint",
      (0L until 12L).map(i => row("a", i)) ++
        (12L until 18L).map(i => row("b", i))).repartition(5)
    val got = Corpus.interleaveBySource(df, "src", "id",
        Seq("a" -> 2.0, "b" -> 1.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq == (0L until 18L)) // a permutation
    val order = got.sortBy(_._3).map(_._1).mkString
    assert(order == "aab" * 6, order)
    // within-source id order is preserved (curriculum stability)
    Seq("a", "b").foreach { s =>
      val ids = got.filter(_._1 == s).sortBy(_._3).map(_._2)
      assert(ids.sorted.toSeq == ids.toSeq, s"source $s reordered: $ids")
    }
    // determinism: rerun is identical
    val again = Corpus.interleaveBySource(df, "src", "id",
        Seq("a" -> 2.0, "b" -> 1.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == again.toSet)
    // stride proportionality: every prefix holds each source's count
    // within 1 of rank-share
    val seq = got.sortBy(_._3).map(_._1)
    (1 to seq.length).foreach { m =>
      val na = seq.take(m).count(_ == "a")
      assert(math.abs(na - m * 2.0 / 3) <= 1.0, s"prefix $m: $na a's")
    }
    // weights must cover every source, loudly
    val err = intercept[IllegalArgumentException] {
      Corpus.interleaveBySource(df, "src", "id", Seq("a" -> 2.0)).collect()
    }
    assert(err.getMessage.contains("no weight"), err.getMessage)
    intercept[IllegalArgumentException] {
      Corpus.interleaveBySource(df, "src", "id",
        Seq("a" -> 2.0, "b" -> 0.0))
    }
  }

  test("seqLenFrontier: hand-computed budgets and the conservation identities") {
    // docs with 3, 5, and 10 tokens
    val df = table("id bigint, text string", Seq(
      row(1L, "a b c"),
      row(2L, "a b c d e"),
      row(3L, (1 to 10).map(i => s"t$i").mkString(" "))))
    val got = Corpus.seqLenFrontier(df, "text", Seq(4, 8))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // L=4: kept = 3+4+4 = 11, trunc loss = 0+1+6 = 7, pad = 1+0+0 = 1,
    // packed = ceil(11/4) = 3; two docs over budget
    assert(got(4L) == Seq(3L, 2L, 18L, 11L, 7L, 1L, 3L), got(4L).toString)
    // L=8: kept = 3+5+8 = 16, trunc = 2, pad = 5+3+0 = 8, packed = 2
    assert(got(8L) == Seq(3L, 1L, 18L, 16L, 2L, 8L, 2L), got(8L).toString)
    // identities hold on arbitrary corpora: kept + trunc == total;
    // pad == budget*n_docs - kept
    val rnd = new scala.util.Random(3)
    val big = table("id bigint, text string",
      (0L until 50L).map(i =>
        row(i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))))
    Corpus.seqLenFrontier(big, "text", Seq(7, 16, 33)).collect().foreach { r =>
      val Seq(b, n, _, total, kept, trunc, pad, seqs) =
        r.toSeq.map(_.asInstanceOf[Long])
      assert(kept + trunc == total, r.toString)
      assert(pad == b * n - kept, r.toString)
      assert(seqs == (kept + b - 1) / b, r.toString)
    }
    intercept[IllegalArgumentException] {
      Corpus.seqLenFrontier(df, "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Corpus.seqLenFrontier(df, "text", Seq(8, 8))
    }
  }
}
