package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.GraftFunctions

/** Bloom-filter join pruning: cut the fact side's shuffle volume down
  * to (matching rows + false positives) BEFORE the join's exchange.
  *
  * The classic 100 TB shape: a huge fact table equi-joined to a
  * selective dimension subset. A plain shuffle join exchanges every
  * fact row on the join key even though only a few percent survive.
  * Building a bloom filter over the dimension's keys (one distributed
  * aggregate; only the sketch — KBs to a few MB — ever reaches the
  * driver) and filtering the fact side map-side first means the join
  * exchange ships only candidate rows. False positives pass the bloom
  * but are eliminated by the join itself, so the result is row-for-row
  * identical to the plain join — the bloom is pure pruning, never
  * semantics.
  *
  * Spark can inject this automatically (runtime row-level filtering,
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`), but only when
  * its size/selectivity heuristics fire. This operator is the explicit,
  * deterministic form for when the pipeline author KNOWS the dimension
  * is selective — the same reasoning the reference applies by caching
  * driver-side metadata lookups (`ons_utils/config/validation.py:313-314`):
  * don't re-pay a cost you can bound up front.
  */
object Bloom {

  /** Inner equi-join of `fact` to `dim` with the fact side pre-pruned by
    * a bloom filter built over `dim`'s join keys.
    *
    * @param expectedNumItems sizing for the sketch — an upper bound on
    *   `dim`'s distinct key count. Overshooting wastes sketch bytes;
    *   undershooting inflates the false-positive rate (still correct,
    *   just less pruning).
    * @param fpp target false-positive probability; the sketch costs
    *   about `-1.44 * log2(fpp)` bits per item.
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedNumItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedNumItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    // Native codegen'd probe (graft.expressions.BloomMightContain) so
    // the fact scan + probe + join-input projection stay ONE
    // whole-stage-codegen span — a Scala UDF here is correct but boxes
    // every key and breaks the stage in two. A null key yields null,
    // which the filter drops — exactly the rows the inner join below
    // could never match.
    val keyCol = fact.schema(factKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(factKey).cast(LongType)
      case StringType => col(factKey)
      case dt =>
        throw new IllegalArgumentException(
          s"bloomPrunedJoin supports integral or string keys, got $dt for $factKey")
    }
    fact.filter(GraftFunctions.bloomMightContain(fact, keyCol, bytes))
      .join(dim, fact.col(factKey) === dim.col(dimKey))
  }
}
