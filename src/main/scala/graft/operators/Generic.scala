package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-side collection utilities — the Scala port of
  * `/root/reference/ons_utils/generic.py`. Pure functions over nested
  * maps and tuple-like key sequences; no Spark session involved.
  */
object Generic {

  type NestedMap = Map[Any, Any]

  /** Flatten a nested map to path-keyed entries, insertion-ordered
    * (the `flatten_dict.flatten` of `generic.py:9-11`). */
  def flattenNested(d: NestedMap, prefix: Vector[Any] = Vector.empty): ListMap[Vector[Any], Any] =
    d.foldLeft(ListMap.empty[Vector[Any], Any]) {
      case (acc, (k, v: Map[_, _])) =>
        acc ++ flattenNested(v.asInstanceOf[NestedMap], prefix :+ k)
      case (acc, (k, v)) => acc + ((prefix :+ k) -> v)
    }

  /** Rebuild a nested map from path-keyed entries. */
  def unflatten(flat: Map[Vector[Any], Any]): NestedMap = {
    val grouped = flat.toSeq.groupBy(_._1.head)
    grouped.map {
      case (k, entries) if entries.forall(_._1.length == 1) && entries.size == 1 =>
        k -> entries.head._2
      case (k, entries) =>
        k -> unflatten(entries.map { case (p, v) => p.tail -> v }.toMap)
    }
  }

  /** Reverse the nesting order of keys (`generic.py:9-11`). */
  def invertNestedKeys(d: NestedMap): NestedMap =
    unflatten(flattenNested(d).map { case (k, v) => k.reverse -> v })

  /** Cartesian (key, value) pairs with sequence values exploded
    * (`generic.py:14-25`). */
  def keyValuePairs(d: Map[Any, Any]): Seq[(Any, Any)] =
    d.toSeq.flatMap { case (k, v) =>
      for (kk <- seqConvert(k); vv <- seqConvert(v)) yield (kk, vv)
    }

  /** Pad tuple-like seqs to uniform length (`generic.py:28-65`):
    * bfill prepends / ffill appends; `repeat` copies the edge value,
    * otherwise fills null. Length defaults to the max seq length; if no
    * element is a seq the input is returned untouched. */
  def fillTuples(
      tuples: Seq[Any],
      length: Option[Int] = None,
      repeat: Boolean = false,
      fillMethod: String = "bfill"): Seq[Seq[Any]] = {
    val seqs = tuples.map { case s: Seq[_] => Some(s); case _ => None }
    val target = length.getOrElse {
      val lens = seqs.flatten.map(_.length)
      if (lens.isEmpty) return tuples.map(seqConvert)
      lens.max
    }
    tuples.map { t =>
      var cur = seqConvert(t)
      while (cur.length < target) cur = fillMethod match {
        case "bfill" => ((if (repeat) cur.head else null): Any) +: cur
        case _       => cur :+ ((if (repeat) cur.last else null): Any)
      }
      cur
    }
  }

  /** fill_tuples over a map's keys (`generic.py:68-88`). */
  def fillTupleKeys(
      d: ListMap[Any, Any],
      length: Option[Int] = None,
      repeat: Boolean = false,
      fillMethod: String = "bfill"): ListMap[Seq[Any], Any] =
    ListMap.from(fillTuples(d.keys.toSeq, length, repeat, fillMethod).zip(d.values))

  /** `nested_dict_to_df` (`/root/reference/ons_utils/pandas.py:9-18`):
    * flatten a nested map, pad ragged key paths to uniform depth
    * (ffill — trailing nulls, mirroring `fill_tuple_keys(fill_method=
    * 'ffill')`), and promote to a long-form Spark DataFrame with one
    * column per key level plus the value column. The MultiIndex of the
    * reference becomes ordinary key columns — the Spark-native shape
    * every other operator here composes with.
    *
    * Driver-side by design (config-sized data): the input is an
    * in-memory map, never a distributed dataset. */
  def nestedDictToDf(
      spark: SparkSession,
      d: NestedMap,
      levelNames: Seq[String] = Nil,
      valueCol: String = "value"): DataFrame = {
    val flat = flattenNested(d)
    val filled = fillTupleKeys(
      ListMap.from(flat.map { case (k, v) => (k: Any) -> v }),
      fillMethod = "ffill")
    val depth = filled.keys.foldLeft(0)((m, k) => math.max(m, k.length))
    val names =
      if (levelNames.nonEmpty) levelNames
      else (0 until depth).map(i => s"level_$i")
    require(names.length == depth,
      s"levelNames has ${names.length} entries for depth-$depth keys")
    // Value dtype by the numeric-widening lattice over ALL values —
    // not just the first — so heterogeneous maps encode instead of
    // failing at runtime (mirroring how pandas upcasts mixed dtypes):
    // all-Int -> int, Int/Long -> bigint, any Double in a numeric mix
    // -> double, uniform Boolean -> boolean, anything else mixed ->
    // string. Every value is then COERCED to the chosen type.
    val nonNull = filled.values.filter(_ != null).toSeq
    val valueType =
      if (nonNull.isEmpty) StringType
      else if (nonNull.forall(_.isInstanceOf[Int])) IntegerType
      else if (nonNull.forall(v => v.isInstanceOf[Int] || v.isInstanceOf[Long]))
        LongType
      else if (nonNull.forall(v => v.isInstanceOf[Int] || v.isInstanceOf[Long]
          || v.isInstanceOf[Double])) DoubleType
      else if (nonNull.forall(_.isInstanceOf[Boolean])) BooleanType
      else StringType
    val schema = StructType(
      names.map(StructField(_, StringType, nullable = true)) :+
        StructField(valueCol, valueType, nullable = true))
    def coerce(v: Any): Any = (v, valueType) match {
      case (null, _) => null
      case (x, StringType) => x.toString
      case (x: Int, LongType) => x.toLong
      case (x: Int, DoubleType) => x.toDouble
      case (x: Long, DoubleType) => x.toDouble
      case (x, _) => x
    }
    val rows = filled.toSeq.map { case (k, v) =>
      val levels = k.map(x => if (x == null) null else x.toString)
      Row.fromSeq(levels ++ Seq(coerce(v)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Scalar -> single-element seq; seqs pass through; null wraps to
    * Seq(null) (`generic.py:96-111` incl. the None -> [None] case). */
  def seqConvert(x: Any): Seq[Any] = x match {
    case s: Seq[_] => s
    case other     => Seq(other)
  }
}
