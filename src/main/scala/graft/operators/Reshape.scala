package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Tidy-frame reshaping — the Spark-native re-imagining of the
  * reference's pandas MultiIndex machinery
  * (`/root/reference/ons_utils/pandas.py:21-64,121-138`). MultiIndexes
  * don't exist in Spark; `unstack` becomes groupBy().pivot() and
  * `stack` becomes unpivot, both over explicit key columns.
  */
object Reshape {

  /** Stacker.unstack (`pandas.py:41-54`): pivot `pivotCol`'s values into
    * columns, keeping `idCols` as the key axis and aggregating
    * `valueCol` with `agg` (first() reproduces pandas' reshaping when
    * (idCols, pivotCol) is unique).
    *
    * Scale note: pass `pivotValues` whenever known — it skips the extra
    * distinct-collect job Spark otherwise runs to discover the column
    * set, and bounds the output width.
    */
  def unstack(
      df: DataFrame,
      idCols: Seq[String],
      pivotCol: String,
      valueCol: String,
      pivotValues: Seq[Any] = Nil,
      agg: Column => Column = first(_, ignoreNulls = true)): DataFrame = {
    val grouped = df.groupBy(idCols.map(col): _*)
    val pivoted =
      if (pivotValues.nonEmpty) grouped.pivot(pivotCol, pivotValues)
      else grouped.pivot(pivotCol)
    pivoted.agg(agg(col(valueCol)))
  }

  /** Stacker.stack (`pandas.py:56-64`): melt `valueCols` back to long
    * form. Column order of the output follows ids ++ (var, value),
    * mirroring the reference's saved-column-order restore. */
  def stack(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      varName: String,
      valName: String): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valName)

  /** `convert_level_to_datetime` (`pandas.py:67-79`): cast a key column
    * to timestamp in place. */
  def levelToTimestamp(df: DataFrame, level: String): DataFrame =
    df.withColumn(level, to_timestamp(col(level)))

  /** `get_index_level_values` (`pandas.py:112-118`): distinct key combos. */
  def indexLevelValues(df: DataFrame, levels: Seq[String]): DataFrame =
    df.select(levels.map(col): _*).distinct()

  /** Fiscal year key for the Feb..Jan+1 timespan: pandas expresses it as
    * shift(-1) / groupby(year) / shift(1) (`pandas.py:121-133`); on an
    * ordered monthly axis that assigns each timestamp to year(ts - 1
    * month), which is directly computable — no shifting needed. */
  def fiscalYear(ts: Column): Column = year(add_months(ts, -1))

  /** Generic `shifted_within_year_apply` (`pandas.py:121-133`): apply an
    * arbitrary per-group transformation within each (keys, Feb..Jan+1
    * fiscal year) group. The reference takes any
    * `pd.DataFrame -> pd.DataFrame` method; here `fn` maps the group's
    * rows (input schema + the appended fiscal-year column) to rows of
    * `outputSchema`, and the group keys — `keys` plus `fiscalYearCol` —
    * are re-broadcast onto every output row (the
    * [[Grouped.applyPerGroup]] contract).
    *
    * Scale shape: one hash shuffle on (keys, fiscalYear); the closure
    * runs inside the executor JVM per group, so skewed group sizes —
    * not total volume — are the limit. Methods expressible as window
    * functions (ffill, running sums) should use the specialized
    * window recipes below instead, which keep whole-stage codegen. */
  def shiftedWithinYearApply(
      df: DataFrame,
      tsCol: String,
      outputSchema: StructType,
      keys: Seq[String] = Nil,
      fiscalYearCol: String = "fiscal_year")(
      fn: Iterator[Row] => Iterator[Row]): DataFrame = {
    val withFy = df.withColumn(fiscalYearCol, fiscalYear(col(tsCol)))
    Grouped.applyPerGroup(withFy, keys :+ fiscalYearCol, outputSchema)(fn)
  }

  /** `shifted_within_year_ffill` (`pandas.py:136-138`): forward-fill
    * `valueCol` within each (keys, Feb..Jan+1 fiscal year) group in
    * `ts` order. One hash shuffle on (keys, fiscalYear); the running
    * `last(ignoreNulls)` frame is computed in a single sorted pass. */
  def shiftedWithinYearFfill(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      keys: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy((keys.map(col) :+ fiscalYear(col(tsCol))): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Plain within-group ffill (no fiscal shift), same window recipe. */
  def ffill(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      keys: Seq[String] = Nil,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }
}
