package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) clustering so that
  * ONE physical sort order serves range/point predicates on SEVERAL
  * columns at once. Files written along the curve carry narrow min/max
  * footer ranges in EVERY interleaved dimension, so parquet row-group
  * and file skipping prunes on any of them — the layout trick behind
  * Delta/Iceberg `ZORDER BY`, built here from plain Spark primitives:
  * a codegen'd bit-interleave expression + `repartitionByRange` +
  * `sortWithinPartitions`.
  *
  * Why not just sort by (x, y)? A lexicographic sort gives x perfect
  * clustering and y none — a y-predicate reads every file. The
  * interleave gives both dimensions ~half the bits of locality, so
  * pruning works on each. (k dims generalize the same way; 2-D is
  * implemented because 3+ dims dilute per-dim locality to bits/k and
  * are rarely worth it.)
  */
object Layout {

  /** Morton interleave of two dimensions already in `[0, 2^bits)`:
    * x occupies the even result bits, y the odd. Out-of-range inputs
    * raise loudly — silent masking would put far-apart rows in the
    * same curve cell and quietly destroy the pruning the caller is
    * buying. Pure bit arithmetic (`2·bits` shift/and/or terms, one
    * fused codegen'd projection): no UDF, no shuffle, scales map-side.
    */
  def mortonInterleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits ($bits) must be in [1, 31]")
    val max = (1L << bits) - 1
    def guarded(c: Column, name: String): Column =
      when(c.isNotNull && c >= 0L && c <= max, c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"mortonInterleave: $name value "), c.cast("string"),
          lit(s" outside [0, ${max}] — normalize dimensions first")))
          .cast("long"))
    val gx = guarded(x, "x")
    val gy = guarded(y, "y")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(gx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(gy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Integer min-max normalization into `[0, 2^bits)`:
    * `(v − min) · 2^bits ÷ (max − min + 1)` — all integer arithmetic,
    * so the cell assignment is bit-reproducible across engines and
    * partitionings (no float rounding anywhere). `min`/`max` are the
    * caller's — computed once per column in a column-pruned scalar
    * pass (see [[zOrder]]) or known from domain bounds.
    *
    * Linear normalization is skew-sensitive: a heavy-hitter value maps
    * many rows to one cell, which costs pruning selectivity but never
    * correctness. The skew-proof alternative is rank-based cells —
    * deliberately NOT built on the default path because an exact rank
    * is a global sort.
    */
  def minMaxCell(v: Column, minV: Long, maxV: Long, bits: Int = 16): Column = {
    require(maxV >= minV, s"max ($maxV) must be >= min ($minV)")
    val span = maxV - minV + 1
    require(span <= (Long.MaxValue >> bits),
      s"span ($span) << $bits overflows — reduce bits")
    // `div` = Catalyst IntegralDivide: exact long arithmetic end to
    // end (a double `/` could round an exact quotient across a cell
    // boundary).
    call_function("div",
      (v.cast("long") - lit(minV)) * lit(1L << bits), lit(span))
  }

  /** Cluster `df` along the Z-curve of two numeric columns: per-column
    * min/max (ONE column-pruned scalar pass), integer min-max cells,
    * Morton interleave, then `repartitionByRange` on the curve
    * position + an in-partition sort. Each output partition (= file,
    * when written) covers one curve segment ⇒ a narrow min/max range
    * in BOTH source columns ⇒ predicates on either prune files.
    * Adds `zCol` (default `__z`); drop it after writing if unwanted.
    */
  def zOrder(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numPartitions: Int,
      bits: Int = 16,
      zCol: String = "__z"): DataFrame = {
    require(numPartitions >= 1, s"numPartitions ($numPartitions) must be >= 1")
    val Array(bounds) = df
      .agg(min(col(xCol)).cast("long").as("xmin"),
        max(col(xCol)).cast("long").as("xmax"),
        min(col(yCol)).cast("long").as("ymin"),
        max(col(yCol)).cast("long").as("ymax"))
      .collect()
    require(!bounds.anyNull, "zOrder needs non-empty, non-null dimensions")
    val z = mortonInterleave(
      minMaxCell(col(xCol), bounds.getLong(0), bounds.getLong(1), bits),
      minMaxCell(col(yCol), bounds.getLong(2), bounds.getLong(3), bits),
      bits)
    df.withColumn(zCol, z)
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
  }

  /** Small-file compaction planner — the table-maintenance decision a
    * 100 TB lakehouse runs nightly (Delta `OPTIMIZE` / Iceberg
    * `rewrite_data_files` bin packing): given a file manifest
    * (`pathCol`, `bytesCol`), assign every small file to a merge bin
    * targeting `targetBytes` of input per rewritten file, and leave
    * already-large files (`bytes >= skipAtOrAbove`) alone (`bin`
    * NULL) — rewriting a file that is already target-sized is pure
    * write amplification.
    *
    * Packing is the SORTED-FILL rule, stated deliberately: files sort
    * by (bytes desc, path — a total order), each file's EXCLUSIVE
    * running byte total is its offset in the packing space, and its
    * bin is `offset DIV targetBytes`. First-fit-decreasing packs a
    * couple percent tighter but is inherently sequential (every
    * placement depends on all previous bins' fill); sorted-fill is
    * one range-partitioned sort + the
    * [[General.withRunningTotal]] two-pass prefix sum — deterministic,
    * engine-independent, and scales to a million-file manifest where
    * a driver-side FFD loop would not. Size-descending order puts the
    * few large files in early bins and sweeps the long tail of tiny
    * files together — every bin's input lands within one file of the
    * target.
    *
    * The manifest is validated loudly (one bounded aggregate): a null
    * path, null byte count, or negative byte count means a corrupt
    * listing and fails with a named cause, never a silently skewed
    * plan.
    *
    * Output: one row per manifest file — `path`, `bytes`, `bin`
    * (NULL = leave in place). Downstream: `groupBy(bin)` +
    * `collect_list(path)` is the per-rewrite-task work list. */
  def compactionPlan(
      manifest: DataFrame,
      pathCol: String,
      bytesCol: String,
      targetBytes: Long,
      skipAtOrAbove: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes ($targetBytes) must be >= 1")
    require(skipAtOrAbove >= 1 && skipAtOrAbove <= targetBytes,
      s"skipAtOrAbove ($skipAtOrAbove) must be in [1, targetBytes] — " +
        "above targetBytes the plan would merge files it also calls large")
    val m = manifest.select(col(pathCol).as("path"),
      col(bytesCol).cast("long").as("bytes"))
    val bad = m.filter(col("path").isNull || col("bytes").isNull ||
      col("bytes") < 0).count()
    require(bad == 0,
      s"compactionPlan: $bad manifest rows have a null path, null size, " +
        "or negative size — corrupt file listing")
    val small = m.filter(col("bytes") < skipAtOrAbove)
      .withColumn("__neg", -col("bytes"))
    val binned = General.withRunningTotal(small, Seq("__neg", "path"),
        "bytes", "__rt")
      .select(col("path"), col("bytes"),
        expr(s"CAST(__rt DIV $targetBytes AS BIGINT)").as("bin"))
    m.filter(col("bytes") >= skipAtOrAbove)
      .select(col("path"), col("bytes"),
        lit(null).cast("bigint").as("bin"))
      .unionByName(binned)
  }
}
