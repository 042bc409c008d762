package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a keyed summary table
  * current by folding in ONLY each new batch, never rescanning the
  * accumulated fact history — at 100 TB the difference between "the
  * daily rollup reads yesterday's summary plus today's shard" and "the
  * daily rollup reads 100 TB". The same algebraic-merge discipline as
  * the exact/near-dup ledgers ([[Dedup.incrementalExactDedup]] /
  * q109): state lives in a compact keyed artifact, ingestion cost
  * tracks the batch. No reference counterpart — the reference's
  * pipelines recompute.
  *
  * Only ALGEBRAIC statistics are maintained (count, sum, min, max):
  * each merges associatively and commutatively, so
  * `summarize(a ∪ b) == merge(summarize(a), summarize(b))` holds
  * exactly (pinned generatively by spec) and a summary can fold in
  * shards in any order. Derived values (mean = sum/count) are computed
  * at read time from the maintained columns — storing them would break
  * mergeability. Holistic statistics (median, distinct) need sketches
  * ([[Profile.profile]]'s HLL path) and are deliberately out of scope
  * here.
  *
  * Determinism: counts/mins/maxes are order-free by nature; SUM over
  * doubles is NOT (addition order varies with partitioning) — callers
  * wanting bit-stable summaries cast value columns to DECIMAL first
  * (the q01 monetary discipline); decimal addition is exact, so shard
  * order can never show.
  */
object Maintain {

  /** What a summary maintains: `sums`/`mins`/`maxs` name FACT columns;
    * the summary carries them as `<c>_sum` / `<c>_min` / `<c>_max`
    * plus the row count `countCol`. */
  final case class SummarySpec(
      sums: Seq[String] = Nil,
      mins: Seq[String] = Nil,
      maxs: Seq[String] = Nil,
      countCol: String = "n") {
    require(sums.nonEmpty || mins.nonEmpty || maxs.nonEmpty,
      "a summary needs at least one maintained statistic")
    def summaryCols: Seq[String] =
      (countCol +: (sums.map(_ + "_sum") ++ mins.map(_ + "_min") ++
        maxs.map(_ + "_max")))
  }

  /** Aggregate a fact batch into summary form: ONE map-side-combined
    * aggregation, exchange bounded by key cardinality. */
  def summarize(df: DataFrame, keys: Seq[String], spec: SummarySpec): DataFrame = {
    require(keys.nonEmpty, "summarize needs grouping keys")
    val aggs = count(lit(1)).as(spec.countCol) +:
      (spec.sums.map(c => sum(col(c)).as(s"${c}_sum")) ++
        spec.mins.map(c => min(col(c)).as(s"${c}_min")) ++
        spec.maxs.map(c => max(col(c)).as(s"${c}_max")))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a batch summary into the base summary: union + ONE keyed
    * re-aggregation of the already-aggregated rows — the exchange is
    * bounded by the UNION of key sets, and the fact rows behind
    * `base` are never touched again. New keys appear, existing keys
    * combine; both inputs must carry the spec's summary columns
    * (anything else is a schema drift bug better caught loudly than
    * silently aggregated away). */
  def merge(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      spec: SummarySpec): DataFrame = {
    require(keys.nonEmpty, "merge needs grouping keys")
    Seq("base" -> base, "delta" -> delta).foreach { case (name, df) =>
      val missing = (keys ++ spec.summaryCols).filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"$name summary is missing columns: ${missing.mkString(", ")}")
    }
    val ordered = (keys ++ spec.summaryCols).map(col)
    val u = base.select(ordered: _*).unionByName(delta.select(ordered: _*))
    val aggs = sum(col(spec.countCol)).cast("long").as(spec.countCol) +:
      (spec.sums.map(c => sum(col(s"${c}_sum")).as(s"${c}_sum")) ++
        spec.mins.map(c => min(col(s"${c}_min")).as(s"${c}_min")) ++
        spec.maxs.map(c => max(col(s"${c}_max")).as(s"${c}_max")))
    u.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
