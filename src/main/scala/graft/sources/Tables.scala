package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the harness star schema (TESTDATA.md).
  *
  * Reads go through `spark.read.parquet` so Catalyst's datasource V2
  * scan handles column pruning and predicate pushdown — verify with
  * `.explain("formatted")` (PushedFilters / ReadSchema).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.parquet's `ts` physical type has varied across harness
    * generations; normalize every variant to a session-tz TIMESTAMP so
    * operators downstream see ONE type:
    *  - TIMESTAMP(NANOS), which Spark 4 cannot read natively: sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong=true` and the ns long
    *    is truncated here to a µs timestamp with integer division
    *    (epoch-ns exceeds double's 53-bit mantissa, so `div`, not `/`);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers
    *    as TIMESTAMP_NTZ: cast to TIMESTAMP — the identity on the
    *    stored micros because every session pins
    *    `spark.sql.session.timeZone=UTC` (and the DuckDB oracle reads
    *    the same naive micros), while leaving the column usable by
    *    `unix_micros`/watermarks, which reject NTZ. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** CSV with an explicit schema — the Spark-native replacement for the
    * reference's pandas `read_csv` -> `createDataFrame` promotion
    * (`/root/reference/tests/conftest.py:180-195`). An explicit schema
    * skips the inference pre-scan (a full extra read at 100 TB), and
    * the CSV DSv2 scan still gets column pruning. */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON-lines (one object per line — the interchange format of most
    * web-corpus dumps) with an explicit schema: no inference pre-scan
    * (a full extra read at 100 TB), unlisted fields are simply never
    * parsed, and the line-delimited framing keeps the format splittable
    * so a 100 GB shard still fans out across tasks. */
  def readJsonLines(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV with a QUARANTINE column — production ingestion's malformed-
    * record handling: rows that fail to parse against the explicit
    * schema land in `corruptCol` with their RAW line preserved
    * (PERMISSIVE mode + `columnNameOfCorruptRecord`), instead of
    * killing the job (FAILFAST) or silently vanishing (DROPMALFORMED).
    * The caller splits `good = corruptCol IS NULL` for the pipeline
    * and quarantines the rest for inspection/replay — at 100 TB a
    * crawl shard ALWAYS has a torn line, and the difference between
    * "3 quarantined rows in a side table" and "job 47 failed at hour
    * six" is this option. Note Spark populates the corrupt column on
    * type-parse failures and extra tokens; a SHORT row null-fills
    * missing trailing columns by CSV convention. */
  def readCsvWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      header: Boolean = true,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** ORC with an explicit schema — the second columnar interchange
    * format next to parquet (warehouses that standardized on
    * Hive/ORC hand shards to a Spark pipeline as-is). Spark's native
    * vectorized ORC reader gives the same column pruning + predicate
    * pushdown as the parquet scan; the explicit schema skips footer
    * merging across a large file listing. */
  def readOrc(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
