package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the shuffle-heavy operators.
  *
  * Spark's AQE rebalances skewed SORT-MERGE joins at runtime, but a
  * hash-partitioned join with one pathological hot key (the empty
  * document, the null user, the default account) still lands that
  * key's every row in one task. Salting splits the hot key's rows
  * across `nSalts` partitions at the cost of replicating the other
  * side `nSalts` times — the classic trade: pay a bounded broadcast-
  * style replication of the (small) build side to unbound the
  * (massive) probe side's worst partition.
  */
object Skew {

  /** Equi-join with a salted key: each left row gets a deterministic
    * salt in [0, nSalts) derived from `saltBy` (a high-cardinality
    * column, e.g. the row's id — NOT the join key), and each right row
    * is replicated once per salt value. The join then runs on
    * (keys..., salt), so a hot key's left rows spread over `nSalts`
    * tasks. Result equals the plain inner equi-join row-for-row.
    *
    * Use when the LEFT side is huge with skewed join-key frequencies
    * and the RIGHT side is small enough to replicate `nSalts` times
    * (but too big or too numerous-keyed to broadcast outright).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltBy: String,
      nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(nSalts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation over a salted key for NON-algebraic
    * aggregates (collect_list/collect_set-style) where Spark's map-side
    * partial aggregation cannot pre-reduce and a hot key accumulates
    * its entire group in one task. Phase 1 aggregates per (key, salt);
    * phase 2 merges the per-salt partials. `partial` builds the
    * per-salt aggregate, `merge` combines partial results.
    *
    * For algebraic aggregates (sum/count/min/max/avg) DON'T use this —
    * Spark's hash aggregate already partial-aggregates map-side and is
    * skew-immune.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBy: String,
      nSalts: Int,
      partial: Column => Column,
      merge: Column => Column,
      valueCol: String,
      outCol: String): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    df.withColumn("__salt",
        pmod(xxhash64(col(saltBy)), lit(nSalts.toLong)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(merge(col("__partial")).as(outCol))
  }

  /** Skew PLANNING report — the measurement that decides whether
    * [[saltedJoin]]/[[saltedAgg]] (or AQE's skew-join split) is worth
    * its replication cost BEFORE a 100 TB shuffle runs: per-key row
    * counts, the keys whose count exceeds `hotFactor` x the mean
    * key load, and for each hot key the salt factor that would bring
    * its worst task back down to `targetFactor` x the mean. This is
    * the number an engineer argues a partitioning change with — "key
    * 7012 carries 31x the mean and wants ~16 salts" — derived from
    * ONE map-side-combined count shuffle over the frame.
    *
    * Arithmetic is integer-exact end to end: the mean key load is ONE
    * driver scalar (`floor(total / n_keys)`, floored at 1 so a
    * degenerate all-empty-group frame cannot divide by zero), hotness
    * is `n > hotFactor * mean` on longs, and the salt recommendation
    * is the ceiling division `ceil(n / (targetFactor * mean))` spelled
    * `(n + d - 1) DIV d` — no IEEE division anywhere, so the report is
    * bit-reproducible on any engine. (Deliberately scalar-based
    * rather than `n * n_keys > hotFactor * total` cross-multiplied
    * form: at petabyte scale `n * n_keys` overflows a long while
    * `total / n_keys` cannot.)
    *
    * Output: one row per HOT key — key columns, `n`, `mean_n` (the
    * same scalar on every row, kept as a column so the report is
    * self-describing), `salt_factor`. Empty when the distribution is
    * within `hotFactor` of uniform — "no action needed" is an empty
    * report, not an error. NULL key values group as one key, exactly
    * as the shuffle they model would. */
  def skewPlanReport(
      df: DataFrame,
      keys: Seq[String],
      hotFactor: Int = 4,
      targetFactor: Int = 2): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    require(hotFactor >= 1, s"hotFactor ($hotFactor) must be >= 1")
    require(targetFactor >= 1, s"targetFactor ($targetFactor) must be >= 1")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    // ONE bounded driver read: two longs, never the key rows
    val t = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("nk"))
      .head()
    require(!t.isNullAt(0) && t.getLong(0) > 0,
      "skewPlanReport needs a non-empty frame")
    val mean = math.max(1L, t.getLong(0) / t.getLong(1))
    val denom = targetFactor.toLong * mean
    counts
      .filter(col("n") > lit(hotFactor.toLong * mean))
      .withColumn("mean_n", lit(mean))
      .withColumn("salt_factor",
        expr(s"CAST((n + ${denom - 1}) DIV $denom AS INT)"))
  }

  /** Join EXPLOSION audit — [[skewPlanReport]]'s sibling for the other
    * way a 100 TB join dies: not one hot key on one side, but a
    * many-to-many key whose per-key row product multiplies out (the
    * accidental join on a low-cardinality or non-key column). For each
    * join key present on BOTH sides, reports both per-key counts, the
    * exact output cardinality `n_left · n_right` the join would
    * produce for that key, and its share of the total projected
    * output — the numbers that turn "the join hangs" into "key
    * lang='en' alone would emit 2.1e10 rows, 41% of the output".
    *
    * Cost is two map-side-combined counts (each bounded by its side's
    * key cardinality) and one key-bounded join — the audit never runs
    * the joined plan it models. Products and their total are computed
    * on longs under ANSI mode, so a product that would overflow fails
    * loudly rather than reporting a wrapped estimate. The share is the
    * single IEEE division, rounded to 6.
    *
    * Output: the `topN` keys by (`out_rows` desc, keys...) — key
    * columns, `n_left`, `n_right`, `out_rows`, `share6`. */
  def joinExplosionAudit(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      topN: Int): DataFrame = {
    require(keys.nonEmpty, "at least one join key column is required")
    require(topN >= 1, s"topN ($topN) must be >= 1")
    val lc = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_right"))
    val perKey = lc.join(rc, keys)
      .withColumn("out_rows", col("n_left") * col("n_right"))
    // ONE bounded driver scalar: total projected output rows
    val total = perKey.agg(coalesce(sum(col("out_rows")), lit(0L)))
      .head().getLong(0)
    require(total > 0,
      "joinExplosionAudit: no join key value appears on both sides")
    perKey
      .withColumn("share6",
        round(col("out_rows").cast("double") / lit(total.toDouble), 6))
      .orderBy(col("out_rows").desc +: keys.map(col): _*)
      .limit(topN)
  }
}
