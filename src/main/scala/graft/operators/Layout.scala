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

  /** Min-max file-skipping effectiveness report — the number that
    * justifies (or rejects) a layout change BEFORE rewriting 100 TB:
    * slice the table into `rowsPerFile`-row files in the proposed
    * `orderCols` order (the write order a sorted rewrite would
    * produce), record each file's min/max of the predicate column —
    * exactly the footer statistics parquet keeps and every lakehouse
    * skipping implementation consults — and for each probe range
    * count the files (and their rows, the scan-cost upper bound) whose
    * [min, max] intersects it. Run it once per candidate layout and
    * the files_scanned column IS the argument ("the z-order rewrite
    * turns a 100%-scan predicate into 12%").
    *
    * Rows with a NULL predicate value count toward file sizes but
    * never widen the pruning bounds (a real reader tracks null counts
    * separately; a file of only NULLs here reports NULL bounds and is
    * skipped by every range probe).
    *
    * Scale shape: file ids ride [[General.withContiguousRowIds]]
    * (range-partitioned — never a single-partition window), per-file
    * stats are one file-bounded aggregation, and probes expand
    * map-side from a bounded literal array. Output: one row per probe
    * — (`probe_lo`, `probe_hi`, `n_files`, `files_scanned`,
    * `rows_scanned`).
    *
    * Reproducibility contract: `orderCols` must be a TOTAL order
    * (no duplicate keys) — [[General.withContiguousRowIds]]' stated
    * determinism condition. With ties, which rows share a file (hence
    * `files_scanned`/`rows_scanned`) could differ across runs and
    * engines, so a coarse layout column must carry a unique tie-break
    * column appended (q197 appends `p_partkey`). Checked LOUDLY with
    * one extra aggregation — a decision report that silently varies
    * run-to-run is worse than one extra pass over a table you are
    * already reading twice. */
  def pruningReport(
      df: DataFrame,
      orderCols: Seq[String],
      predCol: String,
      rowsPerFile: Long,
      probes: Seq[(Double, Double)]): DataFrame = {
    require(orderCols.nonEmpty, "pruningReport needs layout order columns")
    require(rowsPerFile >= 1, s"rowsPerFile ($rowsPerFile) must be >= 1")
    require(probes.nonEmpty, "pruningReport needs at least one probe range")
    probes.foreach { case (lo, hi) =>
      require(lo <= hi, s"probe [$lo, $hi] is inverted")
    }
    val dupKeys = df.groupBy(orderCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0,
      s"pruningReport orderCols (${orderCols.mkString(", ")}) contain " +
        "duplicate keys: file membership would be non-deterministic. " +
        "Append a unique tie-break column (e.g. the table's id).")
    val cols = (orderCols :+ predCol).distinct
    val files = General.withContiguousRowIds(
        df.select(cols.map(col): _*), orderCols, "__rid")
      .withColumn("__fid", (col("__rid") / rowsPerFile).cast("long"))
      .groupBy("__fid")
      .agg(min(col(predCol).cast("double")).as("__mn"),
        max(col(predCol).cast("double")).as("__mx"),
        count(lit(1)).as("__cnt"))
    val probeLit = explode(array(probes.map { case (lo, hi) =>
      struct(lit(lo).as("lo"), lit(hi).as("hi"))
    }: _*))
    val hit = col("__mn") <= col("probe_hi") && col("__mx") >= col("probe_lo")
    files.select(col("__mn"), col("__mx"), col("__cnt"), probeLit.as("__p"))
      .select(col("__p.lo").as("probe_lo"), col("__p.hi").as("probe_hi"),
        col("__mn"), col("__mx"), col("__cnt"))
      .groupBy("probe_lo", "probe_hi")
      .agg(count(lit(1)).as("n_files"),
        sum(when(hit, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(hit, col("__cnt")).otherwise(0L)).as("rows_scanned"))
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
