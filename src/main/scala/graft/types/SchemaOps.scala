package graft.types

import org.apache.spark.sql.types._

/** Diagnostics emitted by schema reconciliation (the JVM replacement for
  * the reference's `warnings.warn(UnequalSchemaWarning)` channel,
  * `/root/reference/ons_utils/pyspark/concat.py:280-285,320-321`).
  */
final case class ColumnDrift(name: String, dtypes: Seq[Option[DataType]]) {
  def render: String =
    s"$name: ${dtypes.map(_.map(_.simpleString).getOrElse("<missing>")).mkString(", ")}"
}

final case class UnequalSchemaWarning(columns: Seq[ColumnDrift]) {
  def message: String =
    "column dtypes in the schemas are not equal, attempting to coerce\n" +
      columns.map(_.render).mkString("\n")
}

/** Raised when a column's types cannot be auto-coerced (the reference's
  * `TypeError`, `concat.py:234-238`). */
final class SchemaCoercionException(msg: String) extends RuntimeException(msg)

/** Result of driver-side schema analysis over the inputs of a concat.
  *
  * @param finalSchema   coerced target schema, columns in first-appearance
  *                      order across the input frames
  * @param schemasEqual  true iff every input already has identical schema
  *                      (same columns, same order-insensitive dtypes)
  * @param warning       present iff dtypes differ among frames where the
  *                      column exists (missing-column-only drift coerces
  *                      silently, `concat.py:277-287`)
  */
final case class SchemaAnalysis(
    finalSchema: StructType,
    schemasEqual: Boolean,
    warning: Option[UnequalSchemaWarning],
)

/** Pure driver-side schema reconciliation for the schema-harmonizing union.
  *
  * Re-expresses `/root/reference/ons_utils/pyspark/concat.py:209-317` over
  * Catalyst `DataType`s instead of dtype strings. The coercion lattice
  * deliberately diverges from Spark's own `TypeCoercion` (decimal(10,0)
  * outranks double, `concat.py:24-33`), which is why this runs pre-plan on
  * the driver rather than as a Catalyst rule.
  */
object SchemaOps {

  /** Widening order, big ---> small (`concat.py:24-33`). Only the exact
    * type `decimal(10,0)` participates, mirroring the reference's
    * stringly-typed lattice: other decimals are NOT auto-coercible.
    */
  val NumericPrecedence: Seq[DataType] = Seq(
    DecimalType(10, 0), DoubleType, FloatType, LongType,
    IntegerType, ShortType, ByteType,
  )

  private val numericSet: Set[DataType] = NumericPrecedence.toSet

  /** Widest type present, by lattice order (`concat.py:247-252`). */
  def largestNumericType(dtypes: Seq[DataType]): DataType =
    NumericPrecedence.find(dtypes.contains).getOrElse(
      throw new SchemaCoercionException(
        s"no lattice numeric type among ${dtypes.map(_.simpleString)}"))

  /** Column names in first-appearance order across all schemas
    * (pandas axis=1 concat index order, `concat.py:304-308`). */
  def columnOrder(schemas: Seq[StructType]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    schemas.foreach(_.fields.foreach(f => seen += f.name))
    seen.toSeq
  }

  /** Full analysis: drift detection + coerced target schema.
    *
    * Per-column resolution (`concat.py:209-244`):
    *  1. any frame has the column as string  -> string (nulls absorbed)
    *  2. every frame's entry (missing -> int) is a lattice numeric
    *     -> widest *present* type (the int default gates eligibility
    *     only; it never widens, `concat.py:224-231`)
    *  3. otherwise the column must be present in ALL frames with one
    *     identical type; anything else (e.g. timestamp vs boolean, or a
    *     timestamp column missing from one frame) throws.
    */
  def analyze(schemas: Seq[StructType]): SchemaAnalysis = {
    require(schemas.nonEmpty, "No objects to concatenate")
    val names = columnOrder(schemas)
    val matrix: Seq[(String, Seq[Option[DataType]])] = names.map { n =>
      n -> schemas.map(s => s.fields.find(_.name == n).map(_.dataType))
    }

    val schemasEqual = matrix.forall { case (_, ds) =>
      ds.forall(_.isDefined) && ds.flatten.distinct.size == 1
    } && schemas.forall(_.fields.map(_.name).sameElements(
      schemas.head.fields.map(_.name)))

    // Warn only where present dtypes genuinely differ (bfill/ffill of
    // missing cells before the check, concat.py:277-278).
    val driftCols = matrix.collect {
      case (n, ds) if ds.flatten.distinct.size > 1 => ColumnDrift(n, ds)
    }
    val warning =
      if (driftCols.nonEmpty) Some(UnequalSchemaWarning(driftCols)) else None

    val (resolved, failures) = matrix.foldLeft(
      (Vector.empty[StructField], Vector.empty[ColumnDrift])) {
      case ((ok, bad), (n, ds)) =>
        val present = ds.flatten
        if (present.contains(StringType))
          (ok :+ StructField(n, StringType, nullable = true), bad)
        else if (ds.map(_.getOrElse(IntegerType)).forall(numericSet.contains))
          (ok :+ StructField(n, largestNumericType(present), nullable = true), bad)
        else if (ds.forall(_.isDefined) && present.distinct.size == 1)
          (ok :+ StructField(n, present.head, nullable = true), bad)
        else (ok, bad :+ ColumnDrift(n, ds))
    }
    if (failures.nonEmpty)
      throw new SchemaCoercionException(
        "Spark column data type mismatch, can't auto-convert between types.\n\n" +
          failures.map(_.render).mkString("\n"))

    SchemaAnalysis(StructType(resolved), schemasEqual, warning)
  }

  /** Target column order for the union output: first frame's own order,
    * then columns missing from it in final-schema (first-appearance)
    * order — what the reference's withColumn-append + unionByName
    * pipeline produces (`concat.py:196-206,130-136`). */
  def outputOrder(first: StructType, finalSchema: StructType): Seq[String] = {
    val own = first.fields.map(_.name).toSeq
    own ++ finalSchema.fields.map(_.name).filterNot(own.contains)
  }

  /** One line of a [[schemaDrift]] report. `change` is `added`,
    * `removed`, `type_changed`, or `nullability_changed`; the type
    * strings are DDL renderings (empty where the side lacks the
    * column). */
  final case class SchemaChange(
      column: String,
      change: String,
      prevType: String,
      nextType: String)

  /** Schema drift between two snapshots of "the same" table — the
    * data-contract check a shard-ingesting pipeline runs BEFORE
    * touching rows: columns added, removed, re-typed, or loosened to
    * nullable between `prev` and `next`. This is the detection side of
    * the coercion machinery ([[analyze]] widens what it can at union
    * time; this REPORTS what changed so a contract owner decides,
    * rather than the lattice silently absorbing an upstream type
    * break). Pure driver-side metadata — no job runs.
    *
    * Nullability TIGHTENING (nullable → required) is reported as
    * `nullability_changed` too: a reader compiled against the old
    * schema still works, but the contract changed and silent
    * tightening is how optional fields rot into load-bearing ones. */
  def schemaDrift(prev: StructType, next: StructType): Seq[SchemaChange] = {
    val p = prev.fields.map(f => f.name -> f).toMap
    val n = next.fields.map(f => f.name -> f).toMap
    val removed = prev.fields.filterNot(f => n.contains(f.name)).map(f =>
      SchemaChange(f.name, "removed", f.dataType.sql, ""))
    val added = next.fields.filterNot(f => p.contains(f.name)).map(f =>
      SchemaChange(f.name, "added", "", f.dataType.sql))
    val common = prev.fields.filter(f => n.contains(f.name))
    val retyped = common.filter(f => f.dataType != n(f.name).dataType).map(f =>
      SchemaChange(f.name, "type_changed", f.dataType.sql,
        n(f.name).dataType.sql))
    val renulled = common.filter(f =>
      f.dataType == n(f.name).dataType &&
        f.nullable != n(f.name).nullable).map(f =>
      SchemaChange(f.name, "nullability_changed",
        s"${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}",
        s"${n(f.name).dataType.sql}${if (n(f.name).nullable) "" else " NOT NULL"}"))
    (removed ++ added ++ retyped ++ renulled).sortBy(c => (c.column, c.change))
  }

  /** One reader-column compatibility verdict. */
  final case class CompatVerdict(
      column: String, readerType: String, writerType: String, verdict: String)

  /** Can data written under `writer` be READ under `reader`? The
    * schema-evolution question every long-lived dataset eventually
    * asks ("we changed the pipeline's output schema — can last year's
    * files still feed this job?"), answered per reader column with
    * the SAME coercion lattice [[analyze]] unions under, so "what
    * concat would harmonize" and "what an old file can supply" are
    * one rule:
    *
    *  - `ok`            — identical type;
    *  - `ok_widen`      — the writer's lattice-numeric type widens to
    *                      the reader's (int data read as long);
    *  - `ok_null_fill`  — the column is absent from the writer and
    *                      the reader declares it nullable (reads as
    *                      NULL — `concat`'s missing-column rule);
    *  - `missing_required` — absent AND the reader requires it;
    *  - `incompatible_type` — present with a type the lattice cannot
    *                      widen (including a NARROWING ask: long data
    *                      into an int reader is data loss, never
    *                      silent).
    *
    * Writer-only columns report `ignored_extra` (projection drops
    * them — informational, never an error). Pure driver-side
    * metadata; rows sorted by column for determinism. */
  def compatibility(reader: StructType, writer: StructType): Seq[CompatVerdict] = {
    val w = writer.fields.map(f => f.name -> f).toMap
    val readerRows = reader.fields.map { rf =>
      w.get(rf.name) match {
        case None =>
          CompatVerdict(rf.name, rf.dataType.sql, "",
            if (rf.nullable) "ok_null_fill" else "missing_required")
        case Some(wf) if wf.dataType == rf.dataType =>
          CompatVerdict(rf.name, rf.dataType.sql, wf.dataType.sql, "ok")
        case Some(wf)
            if numericSet.contains(rf.dataType) &&
              numericSet.contains(wf.dataType) &&
              largestNumericType(Seq(rf.dataType, wf.dataType)) == rf.dataType =>
          CompatVerdict(rf.name, rf.dataType.sql, wf.dataType.sql, "ok_widen")
        case Some(wf) =>
          CompatVerdict(rf.name, rf.dataType.sql, wf.dataType.sql,
            "incompatible_type")
      }
    }
    val rNames = reader.fields.map(_.name).toSet
    val extras = writer.fields.filterNot(f => rNames.contains(f.name)).map(f =>
      CompatVerdict(f.name, "", f.dataType.sql, "ignored_extra"))
    (readerRows ++ extras).sortBy(_.column)
  }
}
