package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed aggregators (`Aggregator[IN, BUF, OUT]` + `udaf`) — the
  * UDAF surface of the engine (SURVEY §2.7). */
object Aggregators {

  /** One scored element flowing into [[TopK]]. */
  final case class Scored(score: Double, id: Long)

  /** One scored element flowing into [[TopKByKey]] — the string-keyed
    * twin of [[Scored]] for corpora whose document ids are strings
    * (URLs, UUIDs, path-like ids). */
  final case class ScoredKey(score: Double, id: String)

  /** Shared bounded top-k heap logic: the buffer never holds more than
    * k elements, ordered by (score desc, id asc) for deterministic
    * ties. Concrete subclasses fix the element type (so the buffer
    * encoder stays a plain non-generic `ExpressionEncoder`) and
    * provide the (−score, id) sort key.
    *
    * Why this beats the `row_number().over(window) <= k` formulation at
    * scale: the window plan shuffles EVERY row of a group to one task
    * and sorts the whole group; this aggregator participates in
    * partial aggregation — each map task reduces its slice to <= k
    * elements before the shuffle, so the exchange carries
    * O(k x partitions) rows per group no matter how skewed the group
    * is. The same shape Spark uses for global TakeOrdered, made
    * available per group. */
  sealed abstract class TopKBase[E, I](k: Int)(implicit iOrd: Ordering[I])
      extends Aggregator[E, Seq[E], Seq[E]] {
    require(k > 0, "k must be positive")
    protected def ord(e: E): (Double, I)
    private val tupleOrd = implicitly[Ordering[(Double, I)]]
    final override def zero: Seq[E] = Vector.empty
    // invariant: the buffer is always sorted by `ord`, so a full buffer
    // rejects a non-qualifying row with one comparison against its
    // worst element — the common case on large groups — instead of
    // re-sorting per row.
    final override def reduce(b: Seq[E], a: E): Seq[E] =
      if (b.size >= k && tupleOrd.gteq(ord(a), ord(b.last))) b
      else ((b :+ a): Seq[E]).sortBy(ord)(tupleOrd).take(k)
    final override def merge(b1: Seq[E], b2: Seq[E]): Seq[E] =
      (b1 ++ b2).sortBy(ord)(tupleOrd).take(k)
    final override def finish(r: Seq[E]): Seq[E] = r.sortBy(ord)(tupleOrd)
  }

  /** Long-keyed bounded top-k; ties break by id ascending numerically. */
  final class TopK(k: Int) extends TopKBase[Scored, Long](k) {
    override protected def ord(s: Scored): (Double, Long) = (-s.score, s.id)
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
  }

  /** String-keyed bounded top-k; ties break by id ascending
    * LEXICOGRAPHICALLY — deterministic, though a different order than
    * [[TopK]]'s numeric tie-break. */
  final class TopKByKey(k: Int) extends TopKBase[ScoredKey, String](k) {
    override protected def ord(s: ScoredKey): (Double, String) = (-s.score, s.id)
    override def bufferEncoder: Encoder[Seq[ScoredKey]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
    override def outputEncoder: Encoder[Seq[ScoredKey]] = bufferEncoder
  }

  /** Grouped top-k: one row per (group, retained element), ordered by
    * (score desc, id asc) within each group. `scoreCol` must be
    * numeric (cast to double), `idCol` integral — enforced, because a
    * non-integral id would cast to NULL and silently drop every row
    * instead of failing.
    *
    * Tie-break caveat: "id asc" here means NUMERIC order ([[TopK]]);
    * callers moving a pipeline to string ids via [[TopKByKey]] (e.g.
    * through `exactCapPerStratum`) get LEXICOGRAPHIC order instead —
    * "10" sorts before "9" — so survivors at a score tie can differ
    * between the twins. Zero-pad string ids if numeric tie order must
    * be preserved. */
  def topKPerGroup(
      df: DataFrame,
      groups: Seq[String],
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"topKPerGroup requires an integral id column, got $idType for '$idCol'")
    val topk = udaf(new TopK(k), Encoders.product[Scored])
    df.groupBy(groups.map(col): _*)
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("__top"))
      .select(groups.map(col) :+ explode(col("__top")).as("__e"): _*)
      .select(groups.map(col) :+ col("__e.score").as(scoreCol) :+ col("__e.id").as(idCol): _*)
  }

  /** One (hash, id, value) row flowing into [[BottomKByHash]]. */
  final case class HashRow(h: Long, id: String, v: Double)

  /** Per-group bottom-k by (hash, id) — the GROUPED tier of the
    * mergeable quantile sketch ([[graft.operators.Profile
    * .sketchStateByGroup]]): keeps the k smallest (hash, id)
    * identities of each group with their values. Id ties (hash
    * collisions) break in UTF-8 BYTE order
    * ([[TextFunctions.Utf8Ordering]]) — the engines' string order —
    * so the retained set replays in any engine. Same scale argument
    * as [[TopKBase]]: map-side partial aggregation bounds every
    * task's buffer at k, the shuffle carries O(k × partitions) rows
    * per group however skewed the group is (a per-group window sort
    * would shuffle whole groups to single tasks). */
  final class BottomKByHash(k: Int)
      extends Aggregator[HashRow, Seq[HashRow], Seq[HashRow]] {
    require(k > 0, "k must be positive")
    private implicit val idOrd: Ordering[String] = TextFunctions.Utf8Ordering
    private val ord = implicitly[Ordering[(Long, String)]]
    private def key(e: HashRow): (Long, String) = (e.h, e.id)
    override def zero: Seq[HashRow] = Vector.empty
    // invariant: buffer sorted by (hash, id) — a full buffer rejects a
    // non-qualifying row with one comparison against its worst element
    override def reduce(b: Seq[HashRow], a: HashRow): Seq[HashRow] =
      if (b.size >= k && ord.gteq(key(a), key(b.last))) b
      else ((b :+ a): Seq[HashRow]).sortBy(key)(ord).take(k)
    override def merge(b1: Seq[HashRow], b2: Seq[HashRow]): Seq[HashRow] =
      (b1 ++ b2).sortBy(key)(ord).take(k)
    override def finish(r: Seq[HashRow]): Seq[HashRow] = r.sortBy(key)(ord)
    override def bufferEncoder: Encoder[Seq[HashRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashRow]]()
    override def outputEncoder: Encoder[Seq[HashRow]] = bufferEncoder
  }

  /** Misra-Gries heavy-hitter sketch: a bounded summary of at most `k`
    * (item, weight) counters with the classical guarantee that any item
    * whose true frequency exceeds n/(k+1) is PRESENT in the final
    * summary (weights may undercount, membership cannot miss).
    *
    * Mergeability is the point at scale: each map task sketches its
    * partition independently, partial aggregation combines sketches
    * pairwise (sum weights, then subtract the (k+1)-th largest weight
    * from all and drop non-positive — Agarwal et al.'s merge, which
    * preserves the n/(k+1) guarantee for the COMBINED stream), so the
    * shuffle carries O(k x partitions) counters regardless of corpus
    * size or skew. A 100 TB token stream reduces to one k-entry map on
    * the driver — compare an exact groupBy whose shuffle is
    * vocabulary-sized. */
  final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "k must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(w) => b.updated(item, w + 1L)
        case None if b.size < k => b.updated(item, 1L)
        case None =>
          // decrement-all eviction: O(k), amortized over >= k arrivals
          b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      }

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val combined = b2.foldLeft(b1) { case (m, (i, w)) =>
        m.updated(i, m.getOrElse(i, 0L) + w)
      }
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest weight, keep strictly positive
        val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        combined.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
  }
}
