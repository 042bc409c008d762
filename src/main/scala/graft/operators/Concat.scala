package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.slf4j.LoggerFactory

import graft.types.{SchemaAnalysis, SchemaOps, UnequalSchemaWarning}

/** Schema-harmonizing n-ary UNION ALL BY NAME with literal key columns —
  * the Spark-native re-expression of the reference's pandas-style
  * `concat` (`/root/reference/ons_utils/pyspark/concat.py:36-160`).
  *
  * Semantics preserved from the reference:
  *  - mismatched column types coerce per the custom lattice (string wins;
  *    else widest numeric with decimal(10,0) > double);
  *  - columns missing from some frames are null-filled with the coerced
  *    type (only legal for string/numeric columns);
  *  - optional key columns identify each source frame, pandas
  *    `concat(keys=...)`-style, multi-part keys supported;
  *  - Map input uses insertion order (the reference relies on dict
  *    ordering at `concat.py:102`), and explicit `keys` subset/reorder it;
  *  - typed errors mirror every raise branch (`concat.py:79-114,143-150`).
  *
  * Plan shape: ONE `select` projection per frame (casts + null-fills +
  * key literals together) under a left-deep union that Catalyst's
  * `CombineUnions` collapses — vs the reference's O(columns) deep
  * `withColumn` chains. Union is partition-local: no shuffle at any scale.
  */
object Concat {
  private val log = LoggerFactory.getLogger(getClass)

  /** Union with no key columns. */
  def concat(frames: Seq[DataFrame]): DataFrame =
    concatWithDiagnostics(frames, Nil, Nil)._1

  /** Union with one key part per frame, in a new column `name`. */
  def concat(frames: Seq[DataFrame], keys: Seq[Any], name: String): DataFrame =
    concatWithDiagnostics(frames, keys.map(Seq(_)), Seq(name))._1

  /** Union with multi-part keys: `keys(i)` labels `frames(i)`; each key
    * has `names.length` parts becoming that many leading columns. */
  def concat(frames: Seq[DataFrame], keys: Seq[Seq[Any]], names: Seq[String]): DataFrame =
    concatWithDiagnostics(frames, keys, names)._1

  /** Map input: insertion-ordered keys label the frames. */
  def concat(frames: ListMap[Seq[Any], DataFrame], names: Seq[String]): DataFrame = {
    require(names.nonEmpty,
      "when the first argument is a mapping, the names argument must be given")
    concatWithDiagnostics(frames.values.toSeq, frames.keys.toSeq, names)._1
  }

  /** Map input with explicit keys: subsets and reorders the mapping
    * (`concat.py:101-105`). */
  def concat(
      frames: Map[Seq[Any], DataFrame],
      keys: Seq[Seq[Any]],
      names: Seq[String]): DataFrame = {
    require(names.nonEmpty,
      "when the first argument is a mapping, the names argument must be given")
    val picked = keys.map(k => frames.getOrElse(k,
      throw new NoSuchElementException(s"key $k not present in frames mapping")))
    concatWithDiagnostics(picked, keys, names)._1
  }

  /** Core implementation; also returns the schema analysis so tests can
    * assert on drift warnings (the reference's `pytest.warns` channel,
    * `tests/pyspark/test_concat.py:415-432`). */
  def concatWithDiagnostics(
      frames: Seq[DataFrame],
      keys: Seq[Seq[Any]],
      names: Seq[String]): (DataFrame, SchemaAnalysis) = {
    require(frames.nonEmpty, "No objects to concatenate")
    if (keys.nonEmpty) {
      require(frames.length == keys.length,
        "keys must be same length as frames when frames is a list or tuple")
      require(keys.forall(_.length == names.length),
        "the length of each key must equal the length of names")
      require(keys.forall(_.length == keys.head.length),
        "all keys must be of equal length")
    }

    val analysis = SchemaOps.analyze(frames.map(_.schema))
    analysis.warning.foreach(w => log.warn(w.message))

    val order = SchemaOps.outputOrder(frames.head.schema, analysis.finalSchema)
    val target = analysis.finalSchema.fields.map(f => f.name -> f.dataType).toMap

    val aligned = frames.zipWithIndex.map { case (df, i) =>
      val own = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val cols: Seq[Column] = order.map { n =>
        val t = target(n)
        own.get(n) match {
          case Some(dt) if dt == t => col(n)
          case Some(_)             => col(n).cast(t).as(n)
          case None                => lit(null).cast(t).as(n)
        }
      }
      val keyCols: Seq[Column] =
        if (keys.isEmpty) Nil
        else names.zip(keys(i)).map { case (nm, part) => lit(part).as(nm) }
      df.select(keyCols ++ cols: _*)
    }

    (aligned.reduce(_.unionByName(_)), analysis)
  }
}
