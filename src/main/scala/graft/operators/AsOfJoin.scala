package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (nearest-event) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (no custom
  * Strategy needed): tag both sides, union, ONE hash shuffle + sort per
  * key, and a running `last(ignoreNulls)` window carries the most
  * recent right-side payload onto each left row.
  *
  * This is the merge-join formulation of as-of: cost is one shuffle of
  * |L|+|R| rows and a per-key sort — no row ever compares against more
  * than its predecessors, so it scales to arbitrarily large sides
  * (contrast with the O(|L|·|R|) theta-join a naive MAX-subquery plan
  * produces). Skew on a hot key degrades to that key's partition only.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * `right.timeCol <= left.timeCol` (backward as-of, inclusive ties)
    * on equal `keys`. Right columns arrive prefixed with `rightPrefix`;
    * unmatched left rows keep nulls. `toleranceUs`, when set, voids
    * matches older than the tolerance (microseconds).
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {

    val rvStruct = struct((rightTime +: rightValues).map(col): _*)
    val rvType = StructType(
      (rightTime +: rightValues).map(c => right.schema(c)))

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        rvStruct.as("__rv")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val unioned = l.select(r.columns.map(col): _*).unionByName(r)
    // NB: l reordered to r's column layout; both carry all needed cols.

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = unioned
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // Tolerance works on both timestamp and numeric time axes.
    def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val withinTol: Column = toleranceUs match {
      case Some(tol) => when(
        col("__match").isNotNull &&
          micros(col("__t"), left.schema(leftTime).dataType) -
            micros(col("__match")(rightTime), right.schema(rightTime).dataType) <= tol,
        col("__match"))
      case None => col("__match")
    }

    val out = matchedRaw.withColumn("__m", withinTol)
    val rightOut = (rightTime +: rightValues).map(c =>
      col("__m")(c).as(s"$rightPrefix$c"))
    out.select(leftCols.map(col) ++ rightOut: _*)
  }

  /** Forward as-of: latest-earliest right row with
    * `right.timeCol >= left.timeCol`. Same machinery on the reversed
    * time axis. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {
    val negL = left.withColumn("__negt", expr(s"-unix_micros($leftTime)"))
    val negR = right.withColumn("__negt", expr(s"-unix_micros($rightTime)"))
    asofBackward(negL, negR, keys, "__negt", "__negt",
      rightValues :+ rightTime, rightPrefix,
      toleranceUs)
      .drop("__negt")
      .drop(s"${rightPrefix}__negt")
  }
}
