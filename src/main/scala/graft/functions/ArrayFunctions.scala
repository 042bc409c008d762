package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array kernels. The reference ships `diff` as a Python UDF over
  * numpy (`/root/reference/ons_utils/pyspark/udfs.py:7-10`), paying an
  * Arrow hop per batch. Here the same semantics compose from built-in
  * higher-order functions, which stay inside whole-stage codegen.
  */
object ArrayFunctions {

  /** First difference of an array column: `[a1-a0, a2-a1, ...]`.
    * Preserves the element type (float in, float out — matching the
    * reference's ArrayType(FloatType) contract for float inputs).
    * Empty/singleton arrays yield an empty array; null yields null.
    */
  def arrayDiff(a: Column): Column =
    zip_with(
      slice(a, lit(2), greatest(size(a) - 1, lit(0))),
      slice(a, lit(1), greatest(size(a) - 1, lit(0))),
      (next, prev) => next - prev)

  /** Scala-UDF variant of [[arrayDiff]] — the "custom route" the
    * reference took; kept for parity demonstration and as a baseline to
    * compare against the codegen'd composition above. Prefer arrayDiff.
    */
  val arrayDiffUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Seq[Float]) =>
      if (a == null) null
      else if (a.length < 2) Seq.empty[Float]
      else a.sliding(2).map(p => p(1) - p(0)).toSeq)

  /** Dot product of two equal-length numeric arrays, accumulated in
    * double, left-to-right (deterministic order). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm, accumulated in double. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity between two array columns, in double. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
