package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Aggregators, TextFunctions}
import graft.operators.Corpus
import graft.testkit.SparkTestKit._

/** PII redaction, deterministic shuffle-shard, and Misra-Gries heavy
  * hitters (SURVEY.md §2.8). */
class PiiShuffleHeavySpec extends AnyFunSuite {

  // ---------------------------------------------------------------- PII

  test("redactPii: each rule family redacts; email rule wins overlaps") {
    val df = table("s string", Seq(
      row("mail a.b-c%d@ex-1.co.uk now"),
      row("call 555-0199 or 555-12345"),   // 2nd: 5 digits -> no \b match
      row("host 10.0.255.7 and 999.1.2.3"),
      row("u555-0042@x.org")))             // digits inside the address
    val out = df.select(TextFunctions.redactPii(col("s")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "call <PHONE> or 555-12345")
    // 999.1.2.3 still matches the 1-3-digit octet pattern (no range
    // check — redaction prefers false positives over leaks)
    assert(out(2) == "host <IP> and <IP>")
    // the whole token is one email match; the phone rule never sees it
    assert(out(3) == "<EMAIL>")
  }

  test("piiCounts: progressive counts never double-count a span") {
    val df = table("s string", Seq(row("a@b.co 555-0001 1.2.3.4 c@d.io")))
    val counts = TextFunctions.piiCounts(col("s"))
    val r = df.select(counts.map { case (n, c) => c.as(n) }: _*).head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 1 && r.getInt(2) == 1)
  }

  // ------------------------------------------------------- shuffleShard

  test("shuffleShard: positions are a permutation, shards round-robin") {
    val df = table("id bigint", (0L until 100L).map(row(_)))
    val out = Corpus.shuffleShard(df, "id", 8).select("id", "pos", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.map(_._2).sorted.toSeq == (0L until 100L))
    assert(out.forall { case (_, pos, shard) => shard == (pos % 8).toInt })
    // deterministic under a different physical layout
    val out2 = Corpus.shuffleShard(df.repartition(7), "id", 8)
      .select("id", "pos", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
    // md5 order is not id order (it actually shuffles)
    assert(out.sortBy(_._1).map(_._2).toSeq != (0L until 100L))
  }

  test("shardManifest: rollups match shuffleShard ground truth, offsets exclusive") {
    val docs = table("id bigint, text string",
      (0L until 30L).map(i => row(i, ("w " * (i + 1).toInt).trim)))
    val manifest = Corpus.shardManifest(docs, "id", "text", nShards = 4)
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ground truth from the q61-pinned primitive + a driver rollup
    val truth = Corpus.shuffleShard(docs, "id", 4)
      .select("id", "shard").collect()
      .map(r => (r.getInt(1), r.getLong(0) + 1)) // doc i has i+1 tokens
      .groupBy(_._1).map { case (s, g) => (s, g.size.toLong, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    assert(manifest.map(t => (t._1, t._2, t._3)).toSeq == truth)
    // offsets = exclusive prefix of n_tokens in shard order; total = corpus
    manifest.foldLeft(0L) { case (acc, (_, _, nt, off)) =>
      assert(off == acc); acc + nt
    }
    assert(manifest.map(_._3).sum == (1L to 30L).sum)
  }

  // ------------------------------------------------------- Misra-Gries

  test("MisraGries guarantee: every item above n/(k+1) survives reduce+merge") {
    val rnd = new scala.util.Random(42)
    val k = 8
    // skewed stream: few heavy items over a wide light tail
    val stream = Seq.fill(5000) {
      if (rnd.nextInt(100) < 60) s"heavy${rnd.nextInt(3)}"
      else s"light${rnd.nextInt(500)}"
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val mg = new Aggregators.MisraGries(k)
    // split into uneven partitions, reduce each, merge pairwise
    val sketch = stream.grouped(700)
      .map(_.foldLeft(mg.zero)(mg.reduce))
      .reduce(mg.merge)
    assert(sketch.size <= k)
    val mustSurvive = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(mustSurvive.nonEmpty, "test stream must contain heavy hitters")
    assert(mustSurvive.subsetOf(sketch.keySet))
    // weights never overcount
    sketch.foreach { case (i, w) => assert(w <= exact(i)) }
  }

  test("heavyHitterTokens: exact result equals the groupBy formulation") {
    val docs = table("text string", Seq(
      row("a a a a a b b b c"), row("a a b b d e"), row("a b c f g")))
    val out = Corpus.heavyHitterTokens(docs, "text", sketchK = 3)
      .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // counts: a=8 b=6 c=2 d=1 e=1 f=1 g=1, n=20, threshold n/4=5
    assert(out == Seq(("a", 8L), ("b", 6L)))
  }
}
