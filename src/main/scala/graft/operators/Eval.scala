package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.functions.Aggregators

/** Retrieval evaluation — the measurement side of the embedding-search
  * family ([[Similarity]] / [[Ivf]] / [[Pq]] produce rankings; this
  * judges them): exact multi-query ground truth + the standard ranked
  * metrics (recall@k, MRR, nDCG@k). An index knob (nprobe, codebook
  * size, dim truncation) is only tunable when its recall cost is a
  * number — q106/q110 sized their knobs by exactly this kind of sweep,
  * done ad hoc; this operator makes it a first-class, oracle-checkable
  * step.
  */
object Eval {

  /** Exact cosine top-k for EVERY query in a driver-bounded query set
    * (the eval sample — hundreds, not millions): queries ship as ONE
    * literal array in the plan (the [[Ivf]] centroid-literal pattern),
    * each corpus row map-side explodes against them and scores through
    * the native codegen'd cosine, and the per-query bounded-heap
    * aggregator ([[Aggregators.topKPerGroup]]) reduces map-side — the
    * shuffle carries O(partitions · |Q| · k) heap entries, never the
    * |corpus| · |Q| score stream, and there is NO join in the plan (a
    * non-equi broadcast join here would plan as a nested-loop).
    *
    * Output: (`query_id`, `item_id`, `rank` 1..k, `score`), rank by
    * (score desc, item_id) — the [[Similarity.bruteForceTopK]] tie
    * rule.
    */
  def topKAllQueries(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Seq[Float])],
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    require(queries.nonEmpty, "topKAllQueries needs at least one query")
    require(k >= 1, s"k ($k) must be >= 1")
    val qlit = array(queries.map { case (qid, v) =>
      struct(lit(qid).as("query_id"), Similarity.vectorLit(v).as("qv"))
    }: _*)
    val exploded = corpus
      .select(col(idCol).cast("long").as("item_id"), col(vecCol).as("__cv"))
      .select(col("item_id"), col("__cv"), explode(qlit).as("__q"))
    val kept =
      if (excludeSelf) exploded.filter(col("item_id") =!= col("__q.query_id"))
      else exploded
    val scored = kept.select(col("__q.query_id").as("query_id"),
      col("item_id"),
      GraftFunctions.cosineF32(corpus, col("__cv"), col("__q.qv")).as("score"))
    val top = Aggregators.topKPerGroup(scored, Seq("query_id"),
      "score", "item_id", k)
    // rank over the k surviving rows per query — |Q|·k rows total
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("item_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("item_id"), col("rank"), col("score"))
  }

  /** Ranked-retrieval metrics per query, binary relevance against a
    * ground-truth top-k: `recall` = |pred ∩ truth| / |truth|, `mrr` =
    * 1 / first predicted rank that hits truth (0 if none), `ndcg` =
    * DCG over hit ranks / ideal DCG for `min(k, |truth|)` relevant
    * items (`1/log2(rank+1)` gains). Both inputs are
    * (`queryCol`, `itemCol`, `rankCol`) frames — ranks 1-based.
    *
    * Every query in `truth` appears in the output, zero-filled when
    * nothing was retrieved — silently dropping zero-recall queries
    * would inflate every mean downstream.
    *
    * Scale shape: one equi-join of two (|Q|·k)-bounded frames + two
    * key-bounded aggregations; the ideal-DCG sum is a per-row
    * higher-order fold over ≤ k terms. Nothing touches the corpus.
    */
  def retrievalMetrics(
      predicted: DataFrame,
      truth: DataFrame,
      queryCol: String,
      itemCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    val gain = (r: org.apache.spark.sql.Column) =>
      lit(1.0) / log(2.0, r.cast("double") + lit(1.0))
    val t = truth.groupBy(col(queryCol).as("query_id"))
      .agg(count(lit(1)).as("n_truth"))
    val hits = predicted.alias("p")
      .join(truth.alias("t"),
        col(s"p.$queryCol") === col(s"t.$queryCol") &&
          col(s"p.$itemCol") === col(s"t.$itemCol"))
      .select(col(s"p.$queryCol").as("query_id"),
        col(s"p.$rankCol").as("__pr"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_hits"),
        min(col("__pr")).as("__minr"),
        sum(gain(col("__pr"))).as("__dcg"))
    val idcg = aggregate(
      sequence(lit(1), least(lit(k), col("n_truth").cast("int"))),
      lit(0.0), (acc, r) => acc + gain(r))
    t.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_truth").cast("double")).as("recall"),
        coalesce(lit(1.0) / col("__minr").cast("double"), lit(0.0)).as("mrr"),
        coalesce(col("__dcg") / idcg, lit(0.0)).as("ndcg"))
  }
}
