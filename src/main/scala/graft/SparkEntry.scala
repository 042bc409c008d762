package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.operators.Concat
import graft.sources.Tables

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2.
  *
  * Float-sum determinism: double addition is order-dependent, and Spark
  * and DuckDB aggregate in different orders. Queries therefore aggregate
  * monetary doubles through DECIMAL(18,2) (exact, order-independent) and
  * cast the final value back to double — both engines produce the
  * bit-identical result the driver's hash compare needs.
  */
object SparkEntry {

  private def decSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Flagship query on sf0.001: schema-harmonizing concat (lattice
    * coercion + null-fill + key column) feeding an aggregation. */
  def entry(spark: SparkSession): DataFrame =
    q05ConcatUnion(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- q01
  /** Baseline grouped aggregation over lineitem (pushdown + partial agg). */
  private def q01SumAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- q05
  /** `concat` end-to-end: two divergent projections of lineitem — double
    * vs int quantity (lattice widens back to double) and a column missing
    * from one side (null-filled) — keyed by source, then aggregated. */
  private def q05ConcatUnion(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val a = li.select(col("l_orderkey"), col("l_returnflag"),
      col("l_quantity").as("qty"))
    val b = li.select(col("l_orderkey"), col("l_returnflag"),
      col("l_quantity").cast("int").as("qty"), col("l_tax").as("tax"))
    Concat.concat(Seq(a, b), Seq("a", "b"), "src")
      .groupBy("src", "l_returnflag")
      .agg(
        decSum(col("qty")).as("sum_qty"),
        decSum(col("tax")).as("sum_tax"),
        count(lit(1)).as("n_rows"))
      .orderBy("src", "l_returnflag")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sum_agg" -> (q01SumAgg _),
    "q05_concat_union" -> (q05ConcatUnion _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_sum_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q05_concat_union" ->
      """WITH u AS (
        |  SELECT 'a' AS src, l_returnflag, l_quantity AS qty,
        |         CAST(NULL AS DOUBLE) AS tax
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'b' AS src, l_returnflag,
        |         CAST(CAST(TRUNC(l_quantity) AS INTEGER) AS DOUBLE) AS qty,
        |         l_tax AS tax
        |  FROM lineitem
        |)
        |SELECT src, l_returnflag,
        |  CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_tax,
        |  COUNT(*) AS n_rows
        |FROM u
        |GROUP BY src, l_returnflag
        |ORDER BY src, l_returnflag""".stripMargin,
  )
}
