package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Eval, Similarity}
import graft.testkit.SparkTestKit._

class EvalSpec extends AnyFunSuite {

  private def vecTable(rows: Seq[(Long, Seq[Float])]) =
    table("vec_id bigint, embedding array<float>",
      rows.map { case (id, v) => row(id, v) })

  test("topKAllQueries: agrees with per-query bruteForceTopK on random vectors") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 40L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() - 0.5f))
    val df = vecTable(corpus)
    val queries = Seq(0L, 17L, 33L).map(i => i -> corpus(i.toInt)._2)
    val got = Eval.topKAllQueries(df, "vec_id", "embedding", queries, 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    queries.foreach { case (qid, qv) =>
      val exp = Similarity.bruteForceTopK(
          df.filter(col("vec_id") =!= qid), "vec_id", "embedding", qv, 5)
        .collect().map(_.getLong(0)).toSeq
      val gotIds = (1 to 5).map(r => got((qid, r)))
      assert(gotIds == exp, s"query $qid: $gotIds vs $exp")
    }
  }

  test("retrievalMetrics: hand-computed recall/MRR/nDCG, zero-hit query kept") {
    def ranked(rows: (Long, Long, Int)*) =
      table("query_id bigint, item_id bigint, rank int",
        rows.map { case (q, i, r) => row(q, i, r) })
    val truth = ranked(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2))
    // query 1: hits at predicted ranks 1 (item 11) and 3 (item 10);
    // query 2: no hits at all
    val pred = ranked(
      (1L, 11L, 1), (1L, 99L, 2), (1L, 10L, 3),
      (2L, 98L, 1), (2L, 97L, 2))
    val got = Eval.retrievalMetrics(pred, truth,
        "query_id", "item_id", "rank", k = 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val dcg1 = 1.0 / log2(2.0) + 1.0 / log2(4.0)       // hits at ranks 1, 3
    val idcg1 = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(got.map(t => (t._1, t._2, t._3)) == Seq((1L, 3L, 2L), (2L, 2L, 0L)))
    assert(math.abs(got(0)._4 - 2.0 / 3) < 1e-12)      // recall
    assert(math.abs(got(0)._5 - 1.0) < 1e-12)          // mrr: first hit rank 1
    assert(math.abs(got(0)._6 - dcg1 / idcg1) < 1e-12) // ndcg
    assert(got(1)._4 == 0.0 && got(1)._5 == 0.0 && got(1)._6 == 0.0)
  }

  test("retrievalMetrics: perfect prediction scores 1.0 everywhere; idcg capped at k") {
    def ranked(rows: (Long, Long, Int)*) =
      table("query_id bigint, item_id bigint, rank int",
        rows.map { case (q, i, r) => row(q, i, r) })
    val truth = ranked((1L, 10L, 1), (1L, 11L, 2))
    val got = Eval.retrievalMetrics(truth, truth,
        "query_id", "item_id", "rank", k = 5)
      .collect().map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length == 1)
    val (rec, mrr, ndcg) = got(0)
    // idcg uses min(k, n_truth)=2 terms — matching the 2 hit gains
    assert(math.abs(rec - 1.0) < 1e-12)
    assert(math.abs(mrr - 1.0) < 1e-12)
    assert(math.abs(ndcg - 1.0) < 1e-12)
  }
}
