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

  /** Export a corpus as `nShards` deterministic shards + an integrity
    * MANIFEST — the handoff artifact of a training-data delivery:
    * the consumer re-derives the manifest from what it received and a
    * lost file, truncated shard, or silently corrupted string shows up
    * as a count or checksum mismatch, not as a training-run mystery.
    *
    * Sharding is [[graft.operators.Corpus.shuffleShard]]'s md5
    * permutation (rerun-stable on any cluster size); rows cluster by
    * shard before the write so each Hive-partition directory receives
    * one task's files. The manifest is computed from a READ-BACK of
    * the written files — integrity of the bytes on disk, not of the
    * plan that produced them. Per shard: row count, character total,
    * the [min, max] permutation positions (contiguity evidence), and
    * an order-free 64-bit content checksum — `bit_xor` of a portable
    * per-row fingerprint ([[graft.functions.TextFunctions.portableTokenHash64]]
    * of `id:text`), associative/commutative so partitioning cannot
    * show, overflow-free where a sum of hashes would trip ANSI mode.
    *
    * Returns the manifest frame: (shard, n_docs, n_chars, min_pos,
    * max_pos, content_xor64). Scale shape: one exported write + one
    * shard-bounded aggregation over the read-back — both
    * embarrassingly parallel, no join anywhere. */
  def exportShardsWithManifest(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val sharded = graft.operators.Corpus.shuffleShard(docs, idCol, nShards)
      .select(col(idCol), col(textCol), col("pos"), col("shard"))
    sharded.repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val back = docs.sparkSession.read.parquet(path)
    val fp = graft.functions.TextFunctions.portableTokenHash64(
      concat(col(idCol).cast("string"), lit(":"), col(textCol)))
    back.select(col("shard").cast("int").as("shard"),
        col("pos"), length(col(textCol)).cast("long").as("__len"),
        fp.as("__fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__len")).as("n_chars"),
        min(col("pos")).as("min_pos"),
        max(col("pos")).as("max_pos"),
        expr("bit_xor(__fp)").as("content_xor64"))
  }
}
