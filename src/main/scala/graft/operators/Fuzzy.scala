package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Blocked fuzzy matching (entity resolution): near-identical records
  * found by edit distance WITHIN cheap blocking buckets — never
  * all-pairs. The classic record-linkage shape: a deterministic
  * blocking key prunes the candidate space to same-bucket pairs, and
  * the quadratic comparison runs only inside buckets whose size a
  * loud guard bounds. No reference counterpart — LLM-pipeline
  * extension (fuzzy dedup of titles/names/boilerplate where token
  * hashing is too coarse and MinHash too loose).
  */
object Fuzzy {

  /** Candidate pairs whose normalized-text PREFIX keys are within
    * `maxDist` Levenshtein edits, blocked on the first `blockLen`
    * characters of the key.
    *
    * Matching contract (deterministic, oracle-checkable): texts are
    * normalized with [[graft.expressions.CleanAsciiText]] (lowercase,
    * strip non-[a-z0-9 ], collapse spaces, trim), keyed on the first
    * `keyLen` characters, and a pair is emitted iff both keys share
    * their first `blockLen` characters AND their edit distance is at
    * most `maxDist`. Prefix blocking is the standard recall tradeoff:
    * a pair whose edits fall inside the first `blockLen` characters is
    * not a candidate — state the block length in the pipeline contract
    * (raise it for recall, at quadratic in-bucket cost).
    *
    * Scale shape: one hash shuffle on the block key, bucket-local pair
    * expansion bounded by `maxBucket` (like the LSH family, an
    * oversize bucket FAILS with a clear message rather than silently
    * exploding a boilerplate-prefix bucket into n² comparisons; pass
    * `dropOversize = true` to accept recall loss instead — and via
    * [[BucketGuard]] the size check runs COUNT-FIRST, before any
    * bucket list exists to OOM an aggregation buffer), and the
    * edit distance runs through Spark's threshold variant, which
    * abandons a row pair the moment the running distance exceeds
    * `maxDist` — O(keyLen * maxDist) per comparison, not O(keyLen²).
    */
  def blockedFuzzyPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keyLen: Int = 24,
      blockLen: Int = 6,
      maxDist: Int = 3,
      maxBucket: Int = 1000,
      dropOversize: Boolean = false): DataFrame = {
    require(keyLen > blockLen && blockLen >= 1,
      s"need keyLen ($keyLen) > blockLen ($blockLen) >= 1")
    require(maxDist >= 0, s"maxDist ($maxDist) must be >= 0")
    require(maxBucket >= 2, s"maxBucket ($maxBucket) must be >= 2")
    // NULL texts normalize to NULL keys: no pair they could join could
    // ever pass the dist filter (levenshtein with a NULL side is NULL),
    // so drop them BEFORE the groupBy — otherwise every null-text row
    // piles into one degenerate bucket that wastes n² comparisons or
    // trips the oversize guard for pairs that were never candidates.
    val keyed = df.select(col(idCol).as("id"),
        substring(GraftFunctions.cleanText(df, lower(col(textCol))), 1, keyLen)
          .as("key"))
      .filter(col("key").isNotNull)
      .select(struct(col("id"), col("key")).as("dk"),
        substring(col("key"), 1, blockLen).as("blk"))
    // Count-first guard: the per-block cardinality is checked (and an
    // oversize block raised/dropped) BEFORE collect_list materializes
    // any bucket — a degenerate shared prefix fails on a long, never by
    // OOMing the aggregation buffer.
    BucketGuard.bounded(keyed, Seq("blk"), minSize = 2, maxBucket, dropOversize,
        n => concat(
          lit(s"fuzzy block exceeded maxBucket=$maxBucket (size "),
          n.cast("string"),
          lit(") — a degenerate shared prefix would go quadratic. " +
            "Raise blockLen/maxBucket, pre-filter the boilerplate, or " +
            "pass dropOversize=true to accept recall loss.")))
      .groupBy("blk").agg(collect_list(col("dk")).as("ds"))
      .select(explode(col("ds")).as("x"), col("ds"))
      .select(col("x"), explode(col("ds")).as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        levenshtein(col("x.key"), col("y.key"), maxDist).as("dist"))
      .filter(col("dist") >= 0) // threshold variant returns -1 past maxDist
  }
}
