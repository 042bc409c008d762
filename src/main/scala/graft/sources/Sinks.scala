package graft.sources

import org.apache.spark.sql.DataFrame

/** Parquet sink helpers. The reference writes nothing (SURVEY §2.2);
  * a 100 TB pipeline lives or dies by its write layout, so the engine
  * makes the two layouts that matter easy:
  *
  *  - '''Hive-partitioned''' (`partitionBy`): one directory per
  *    partition value. Readers filtering on the partition column get
  *    PARTITION PRUNING — untouched partitions are never listed, let
  *    alone read.
  *  - '''Bucketed tables''' (`bucketBy` + `saveAsTable`): co-located
  *    join/aggregation keys — equi-joins between tables bucketed on
  *    the same key by the same count plan with NO shuffle exchange.
  */
object Sinks {

  /** Write `df` as parquet partitioned by `partitionCols`.
    * `maxRecordsPerFile` bounds file sizes (0 = unbounded); pair with
    * a `repartition` on the partition columns upstream when the job
    * would otherwise write one small file per task per partition. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: String = "overwrite",
      maxRecordsPerFile: Long = 0L): Unit =
    df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Save as a bucketed (and optionally sorted) table for co-located
    * downstream joins on `bucketCols`.
    *
    * Overwrite is made restart-safe for simple (current-database) table
    * names: an in-memory catalog forgets its tables when the session
    * ends but the managed-table FILES survive in the warehouse dir, so
    * a fresh session's `saveAsTable` would fail with
    * LOCATION_ALREADY_EXISTS even in overwrite mode — the orphaned
    * location is cleared first when the catalog has no entry for the
    * table (when it does, overwrite's own drop handles it). The orphan
    * path is resolved through the session catalog (database location +
    * table name), so with a non-default current database the delete
    * targets `mydb.db/t`, never `default`'s live `t` directory. */
  def writeBucketedTable(
      df: DataFrame,
      table: String,
      buckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    if (mode == "overwrite" && !table.contains('.') &&
        !spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
