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
}
