package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-first oversize-bucket guard shared by the collect_list family
  * (LSH banding, fuzzy blocking): every bucket's cardinality is known —
  * and acted on — BEFORE any bucket list is materialized.
  *
  * The hazard this removes: a guard expressed as
  * `size(collect_list(...)) > maxBucket` evaluates only AFTER the
  * aggregation buffer holds the whole bucket. ObjectHashAggregate's
  * per-key ArrayBuffer grows unboundedly in memory (its sort-based
  * fallback bounds the number of KEYS, not one key's list), so a
  * degenerate hot key — a shared boilerplate prefix, the
  * empty-document LSH key — OOMs an executor before the intended clear
  * failure message can run. Here the cardinality is computed as ONE
  * LONG per row via a whole-partition count window: WindowExec buffers
  * each bucket in a spillable row array (`ExternalAppendOnlyUnsafeRowArray`),
  * so even a billion-row bucket costs disk, not heap, and the
  * keep/drop/raise decision filters ROWS before any downstream
  * `collect_list` sees them — the guard triggers on a long, never a
  * materialized list.
  *
  * Single-scan by construction: the window's hash exchange on the
  * bucket key is the SAME partitioning the downstream groupBy needs,
  * so Catalyst reuses it (one shuffle total) and the map-side
  * signature/shingle work feeding the keys runs ONCE — unlike a
  * count-aggregate + semi-join pre-pass, which scans and recomputes
  * the keyed input twice and pays a second exchange for the join.
  */
private[operators] object BucketGuard {

  /** Temp column name for the per-bucket cardinality. */
  val CountCol = "__graft_bn"

  /** `keyed` plus a [[CountCol]] long = each row's bucket cardinality,
    * computed by a whole-partition count window (spillable, list-free). */
  def withBucketCount(keyed: DataFrame, keyCols: Seq[String]): DataFrame = {
    TempCols.reserve(keyed, "BucketGuard", CountCol)
    keyed.withColumn(CountCol,
      count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
  }

  /** Rows of buckets with cardinality in `[minSize, maxBucket]`. An
    * oversize bucket either raises `oversizeMsg(cardinality)` the
    * moment one of its rows is seen (the loud default) or is dropped
    * wholesale (`dropOversize`) — in both cases before any list
    * aggregation. The raise rides the FILTER predicate, never a
    * projected column Catalyst could prune away. */
  def bounded(
      keyed: DataFrame,
      keyCols: Seq[String],
      minSize: Int,
      maxBucket: Int,
      dropOversize: Boolean,
      oversizeMsg: Column => Column): DataFrame = {
    val counted = withBucketCount(keyed, keyCols)
    val kept =
      if (dropOversize) counted.filter(col(CountCol).between(minSize, maxBucket))
      else counted.filter(col(CountCol) >= minSize &&
        when(col(CountCol) <= maxBucket, lit(true))
          .otherwise(raise_error(oversizeMsg(col(CountCol))).cast("boolean")))
    kept.drop(CountCol)
  }
}
