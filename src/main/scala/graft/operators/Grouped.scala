package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** Grouped-map lifting — the Spark-native (all-JVM) replacement for the
  * reference's GROUPED_MAP pandas-UDF factory
  * (`/root/reference/ons_utils/pyspark/general.py:42-106`).
  *
  * Contract preserved: the function runs once per group over the group's
  * rows, and the group-key values are re-broadcast onto every output row
  * as leading columns (`general.py:96-104`). The Arrow/Python IPC hop of
  * the reference disappears: one hash shuffle on the keys, then the
  * closure runs inside the executor JVM.
  *
  * Scale note: a group must fit in one task's memory (same constraint
  * as the reference's pandas path). Keys are hash-partitioned, so skewed
  * group sizes — not total data volume — are the limit.
  */
object Grouped {

  /** Untyped variant: `fn` maps the group's rows (full input schema) to
    * output rows matching `outputSchema`; group keys are prepended.
    * Result schema = key fields ++ outputSchema. */
  def applyPerGroup(
      df: DataFrame,
      groups: Seq[String],
      outputSchema: StructType)(
      fn: Iterator[Row] => Iterator[Row]): DataFrame = {
    val keySchema = StructType(groups.map(g => df.schema(g)))
    val fullSchema = StructType(keySchema.fields ++ outputSchema.fields)
    val keyIdx = groups.map(df.schema.fieldIndex)
    val keyEnc: Encoder[Row] = Encoders.row(keySchema)
    val outEnc: Encoder[Row] = Encoders.row(fullSchema)
    df.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(keyEnc)
      .flatMapGroups { (key: Row, rows: Iterator[Row]) =>
        fn(rows).map(out => Row.fromSeq(key.toSeq ++ out.toSeq))
      }(outEnc)
  }

  /** [[applyPerGroup]] with a guaranteed within-group iteration order
    * (secondary sort): rows arrive at `fn` sorted by `sortCols`. Spark
    * sorts each group inside the shuffle machinery
    * (`flatMapSortedGroups`), so order-dependent methods (ffill,
    * interpolation, sessionization-style scans) need no driver-side
    * sorting and no per-group buffering just to sort. */
  def applyPerGroupSorted(
      df: DataFrame,
      groups: Seq[String],
      sortCols: Seq[String],
      outputSchema: StructType)(
      fn: Iterator[Row] => Iterator[Row]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val keySchema = StructType(groups.map(g => df.schema(g)))
    val fullSchema = StructType(keySchema.fields ++ outputSchema.fields)
    val keyIdx = groups.map(df.schema.fieldIndex)
    val keyEnc: Encoder[Row] = Encoders.row(keySchema)
    val outEnc: Encoder[Row] = Encoders.row(fullSchema)
    df.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(keyEnc)
      .flatMapSortedGroups(sortCols.map(col): _*) { (key: Row, rows: Iterator[Row]) =>
        fn(rows).map(out => Row.fromSeq(key.toSeq ++ out.toSeq))
      }(outEnc)
  }

  /** Typed variant for compile-time safety when case classes model the
    * rows: per-group function with the key passed explicitly. */
  def applyPerGroupTyped[T, K: Encoder, U: Encoder](
      ds: Dataset[T],
      key: T => K)(
      fn: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    ds.groupByKey(key).flatMapGroups((k: K, it: Iterator[T]) => fn(k, it).iterator)
}
