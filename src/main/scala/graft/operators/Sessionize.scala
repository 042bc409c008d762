package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since
  * the key's previous event exceeds `gapUs`. One hash shuffle on the
  * keys + per-key sort; session ids come from a running sum over the
  * sorted partition (no state store needed in batch).
  */
object Sessionize {

  /** Adds `session_id` (1-based per key, in time order). `tieBreak`
    * makes same-timestamp ordering deterministic. */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapUs: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    df.withColumn("__new",
        when(prev.isNull || unix_micros(col(tsCol)) - prev > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .drop("__new")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(
      sessions: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String): DataFrame =
    sessions.groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"))
}
