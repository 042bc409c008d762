package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.functions.TextFunctions

/** Deduplication operators for large-scale corpus pipelines: exact
  * (hash-keyed), MinHash+LSH, SimHash, and windowed n-gram Jaccard.
  * No reference counterpart — LLM-pipeline extensions designed
  * shuffle-bounded for 100 TB (every stage is a hash shuffle on a
  * bounded key or a bucket-local pair expansion; nothing is O(n²) on
  * the full corpus).
  */
object Dedup {

  /** Exact dedup: keep exactly one row per key, the one with the lowest
    * `orderCol` (deterministic, unlike dropDuplicates; ties impossible
    * when orderCol is unique).
    *
    * Formulated as an ALGEBRAIC aggregation — `min_by(struct(cols),
    * orderCol)` — not a window `row_number`: the aggregate gets
    * map-side partial aggregation, so each executor reduces its own
    * duplicates before the shuffle and a skewed key ships one
    * pre-reduced row per map task instead of dragging every duplicate
    * into a single sorted partition. At 100 TB with a degenerate key
    * (e.g. the empty document) that is the difference between a working
    * job and a straggler. */
  def exactDedup(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(payload.map(col): _*), col(orderCol)).as("__row"))
      .select(keys.map(col) ++ payload.map(c => col(s"__row.$c").as(c)): _*)
      // restore the input column order
      .select(df.columns.map(col): _*)
  }

  /** Winner ids only: the shuffle carries just (keys, orderCol) pairs.
    * [[exactDedup]] ships every surviving row's full payload through
    * its shuffle (min_by of the whole-row struct) — right when the
    * output IS the deduped corpus. When payloads are heavy (full
    * document text) and the caller only needs survivor identities, or
    * will fetch a selective subset later, this variant keeps the
    * shuffle payload-free. */
  def exactDedupIds(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(min(col(orderCol)).as(orderCol))

  /** Window-sort formulation of [[exactDedup]] — same result, one
    * per-key sorted pass. Prefer the algebraic form; this exists for
    * rank-dependent generalizations (keep top-N per key). */
  def exactDedupViaWindow(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact text dedup on the md5 fingerprint of normalized text. The
    * normalization runs through the native single-pass
    * [[graft.expressions.CleanAsciiText]] (byte-identical to the
    * two-regex composed form on lowercased input, ~one regex-engine
    * pass cheaper per document). */
  def exactTextDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exactDedup(
      df.withColumn("__fp",
        md5(GraftFunctions.cleanText(df, lower(col(textCol))))),
      Seq("__fp"), idCol).drop("__fp")

  /** MinHash signature of a distinct-shingle array: k independent hash
    * functions realized as seeded xxhash64 (shingle, seed i), each taking
    * the min over the shingle set.
    *
    * This is the portable composed-builtins formulation (single pass,
    * element-wise running min via `aggregate` + `zip_with(least)`).
    * The LSH pipeline itself uses the native
    * [[graft.expressions.MinHashSig]] expression instead — same recipe
    * inside one Janino-compiled loop, with none of the per-step array
    * allocation interpreted higher-order functions pay. */
  def minHashSignature(shingles: Column, k: Int): Column = {
    // Hash each variable-length shingle STRING once (the expensive step),
    // then derive the k seeded values by re-hashing the resulting 8-byte
    // long with the seed: h_i = xxhash64(h, i). Multi-arg xxhash64 is a
    // codegen'd built-in with no overflow arithmetic, so it is safe under
    // Spark 4's default ANSI mode (integer-mixing constants like
    // Kirsch-Mitzenmacher rely on Long wrap-around, which ANSI rejects
    // with ARITHMETIC_OVERFLOW).
    val hashed = transform(shingles, s => xxhash64(s))
    aggregate(
      hashed,
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(1), lit(k)), i => xxhash64(h, i)),
        (a, v) => least(a, v)))
  }

  /** LSH band keys for a signature: `bands` hashes, each over a
    * contiguous `rows`-wide slice. Emitted as structs (band, key). */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), xxhash64(slice(sig, b * rows + 1, lit(rows))).as("key")))

  /** Candidate near-duplicate pairs by MinHash+LSH, verified with exact
    * shingle Jaccard.
    *
    * Plan at scale: shingle+sign each doc (map-only) -> explode to
    * (band, key) -> hash shuffle on the band key -> per-bucket pair
    * expansion via self-join -> distinct candidates -> join signatures'
    * shingle sets back (hash joins on id) -> exact Jaccard filter.
    * Only bucket-local pairs are ever materialized, so cost tracks the
    * number of colliding pairs, not n². Skew guard: buckets larger than
    * `maxBucket` are dropped (a giant bucket means a degenerate key —
    * e.g. empty docs — not useful dup candidates).
    */
  def minHashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    // Deliberately NOT cached: the only branch that needs the expensive
    // k-hash signature is the banding one (the verify-join sides below
    // select just (id, sh), so Catalyst's column pruning drops the `sig`
    // computation there). The cost of no cache is recomputing the
    // map-side shingling for the two join sides — partition-local work
    // that scales with a columnar re-scan — whereas materializing a
    // >=10x-corpus-size (shingles, signature) cache is exactly what a
    // 100 TB cluster cannot afford, and a persist with no unpersist pins
    // memory/disk for the rest of the session.
    val docs = df.select(
      col(idCol).as("id"),
      GraftFunctions.shingles(df,
        TextFunctions.tokens(col(textCol)), shingleN).as("sh"))
      .withColumn("sig", GraftFunctions.minhashSig(df, col("sh"), numHashes))

    val banded = docs
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))

    val bucketed = banded
      .groupBy("band", "key").agg(collect_list("id").as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))

    val candidates = bucketed
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()

    val shA = docs.select(col("id").as("a"), col("sh").as("sh_a"))
    val shB = docs.select(col("id").as("b"), col("sh").as("sh_b"))
    candidates
      .join(shA, "a").join(shB, "b")
      .withColumn("jaccard", TextFunctions.shingleJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("a").as("id_a"), col("b").as("id_b"), col("jaccard"))
  }

  /** 32-bit SimHash over the token stream: each token hashed once
    * (`transform` binds the hash), then the native
    * [[graft.expressions.SimHash32FromHashes]] expression accumulates
    * the 32 +1/-1 counters and packs the sign pattern in one
    * Janino-compiled loop. Near-dups differ in few bits — compare with
    * [[hammingDistance32]].
    *
    * `tokenHash` picks the per-token hash column: default is xxhash64
    * (fastest; engine-internal), while
    * [[TextFunctions.portableTokenHash32]] gives a slower md5-derived
    * hash reproducible in other engines (used by the DuckDB oracle). */
  def simHash32(
      df: DataFrame,
      textCol: String,
      outCol: String,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val hashes = transform(toks, t => tokenHash(t))
    df.withColumn(outCol, GraftFunctions.simhash32(df, hashes))
  }

  /** Hamming distance between two 32-bit simhashes. */
  def hammingDistance32(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** ALL-PAIRS SimHash near-duplicates: banded simhash buckets (pairs
    * whose signatures agree on at least one contiguous `32/bands`-bit
    * band become candidates) verified with exact Hamming distance.
    * Same shuffle-bounded LSH shape as [[minHashNearDupPairs]] — one
    * hash shuffle on the band key, bucket-local pair expansion with a
    * `maxBucket` skew guard, candidate-only verification — and, when
    * `maxHamming <= bands - 1`, a PIGEONHOLE GUARANTEE of full recall:
    * maxHamming differing bits can dirty at most maxHamming bands, so
    * at least one band is identical and the pair always becomes a
    * candidate. No probabilistic recall argument needed.
    *
    * Scale note: a 32-bit signature banded 4 ways gives 8-bit band
    * keys (256 buckets) — ample for corpora up to ~10^5 docs; beyond
    * that, widen the signature before banding or raise `bands` with a
    * larger signature, or bucket sizes grow linearly. */
  def simHashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucket: Int = 1000,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(32 % bands == 0, s"bands ($bands) must divide 32")
    val rows = 32 / bands
    val mask = (1L << rows) - 1
    // Unlike the MinHash pipeline (whose verify payload — the shingle
    // sets — is far too big to ship through the band explode), a
    // simhash signature is ONE long: carrying it through the shuffle
    // costs 8 bytes/row and eliminates both join-backs AND the two
    // signature recomputations they would trigger.
    val sigs = simHash32(df, textCol, "sim", tokenHash)
      .select(struct(col(idCol).as("id"), col("sim")).as("ds"))
    val banded = sigs.select(col("ds"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("ds.sim"), b * rows).bitwiseAND(lit(mask)).as("key"))
        }: _*)).as("bk"))
      .select(col("ds"), col("bk.band").as("band"), col("bk.key").as("key"))
    val bucketed = banded
      .groupBy("band", "key").agg(collect_list("ds").as("ds"))
      .filter(size(col("ds")).between(2, maxBucket))
    bucketed
      .select(explode(col("ds")).as("x"), col("ds"))
      .select(col("x"), explode(col("ds")).as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        hammingDistance32(col("x.sim"), col("y.sim")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair may collide in several bands
  }
}
