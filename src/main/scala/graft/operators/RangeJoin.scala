package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Bounded range join — pairs with equal keys and
  * `|left.time - right.time| <= delta` — via time bucketing, the
  * shuffle-bounded alternative to the nested-loop plan Spark produces
  * for a raw range predicate.
  *
  * Both sides bucket by `floor(time / delta)`; every matching pair is
  * at most one bucket apart, so the left side probes its own and both
  * adjacent buckets (a 3-way explode), the join runs as an ordinary
  * hash equi-join on (keys, bucket), and the exact predicate filters
  * the candidates. Cost: one hash shuffle per side (left 3x amplified)
  * plus candidates bounded by per-bucket occupancy — never |L| x |R|.
  * A pair joins exactly once (the right row has one bucket).
  */
object RangeJoin {

  private def micros(df: DataFrame, c: String): Column =
    if (df.schema(c).dataType == TimestampType) unix_micros(col(c))
    else col(c).cast("long")

  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      deltaUs: Long,
      rightValues: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    require(deltaUs > 0, "deltaUs must be positive")
    val l = left
      .withColumn("__lt", micros(left, leftTime))
      .withColumn("__bucket",
        explode(array(Seq(-1, 0, 1).map(o =>
          expr(s"__lt div ${deltaUs}L") + lit(o.toLong)): _*)))
    val r = right.select(
      keys.map(col) ++ Seq(micros(right, rightTime).as("__rt")) ++
        rightValues.map(c => col(c).as(s"$rightPrefix$c")): _*)
      .withColumn("__bucket", expr(s"__rt div ${deltaUs}L"))
    l.join(r, keys :+ "__bucket")
      .filter(abs(col("__lt") - col("__rt")) <= deltaUs)
      .drop("__bucket", "__lt", "__rt")
  }
}
