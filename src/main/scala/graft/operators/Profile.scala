package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling: the pre-flight scan a 100 TB ingest runs
  * before committing to a pipeline — null rates, cardinalities, value
  * ranges, and the hot values that will skew every downstream join.
  * The reference has no profiling surface (its frames are small enough
  * to eyeball); at training-corpus scale, profiling IS the operator
  * that decides partition counts, join strategies, and salting.
  */
object Profile {

  /** One row per profiled column: total rows, null count, distinct
    * cardinality, and min/max rendered as strings (the only type a
    * mixed-column long-form frame can carry losslessly).
    *
    * Output: (col_name, n_rows, n_null, n_distinct, min_val, max_val).
    *
    * Scale shape: ONE aggregation over one scan — every statistic is
    * algebraic (sum / min / max / HLL sketch), so partial aggregation
    * combines map-side and the exchange carries one row per partition.
    * The long form is produced by exploding the single result row,
    * which never touches executors again.
    *
    * `exactDistinct = false` (the default, the 100 TB path) estimates
    * cardinality with HyperLogLog++ (`approx_count_distinct`, relative
    * error `rsd`): sketches merge map-side like any other partial agg.
    * `exactDistinct = true` is engine-exact for oracle comparison and
    * small frames, but pays Spark's multi-distinct Expand — the scan's
    * rows are replicated once per profiled column before aggregation —
    * so it is deliberately NOT the default. */
  def profile(
      df: DataFrame,
      cols: Seq[String],
      exactDistinct: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    def distinctAgg(c: String): Column =
      if (exactDistinct) count_distinct(col(c)) else approx_count_distinct(col(c), rsd)
    val aggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null__$c"),
        distinctAgg(c).as(s"__dist__$c"),
        min(col(c)).cast("string").as(s"__min__$c"),
        max(col(c)).cast("string").as(s"__max__$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n_rows").as("n_rows"),
        col(s"__null__$c").as("n_null"),
        col(s"__dist__$c").as("n_distinct"),
        col(s"__min__$c").as("min_val"),
        col(s"__max__$c").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("__p")).select(col("__p.*"))
  }

  /** The skew probe: exact top-`k` most frequent values per profiled
    * column, the thing to run BEFORE keying a join or aggregation on a
    * column at scale — a value holding 30% of a 100 TB table is a
    * straggler task unless salted, and this is how it's found.
    *
    * Output: (col_name, value, n), ordered (n desc, value asc) within
    * each column; null values are not counted (they are [[profile]]'s
    * `n_null`). Values are rendered as strings so one frame profiles
    * columns of any type.
    *
    * Scale shape: one explode to (col_name, value) — the scan's rows
    * x profiled columns, map-only — then a map-side-combined count per
    * (col_name, value), then the bounded-heap
    * [[graft.functions.Aggregators.TopKByKey]] per column: every map
    * task's contribution is capped at `k` candidates before the final
    * exchange, so the heavy column costs O(k x partitions) exchange
    * rows — never a per-column window sort, which would funnel every
    * distinct value of a column through one task. Counts ride the
    * heap's double score: exact to 2^53, far past any real frequency.
    * Ties at equal count break by value ascending lexicographically —
    * deterministic, and matched by the oracle's ORDER BY. */
  def topValues(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(k > 0, "k must be positive")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val pairs = df
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))
      }: _*)).as("__e"))
      .select(col("__e.col_name").as("col_name"), col("__e.value").as("value"))
      .filter(col("value").isNotNull)
    val counted = pairs.groupBy("col_name", "value").agg(count(lit(1)).as("n"))
    val topk = udaf(new graft.functions.Aggregators.TopKByKey(k),
      Encoders.product[graft.functions.Aggregators.ScoredKey])
    counted
      .groupBy("col_name")
      .agg(topk(col("n").cast("double"), col("value")).as("__top"))
      .select(col("col_name"), explode(col("__top")).as("__e"))
      .select(col("col_name"), col("__e.id").as("value"),
        col("__e.score").cast("long").as("n"))
  }
}
