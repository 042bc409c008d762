package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract-checking gate
  * of an ingestion pipeline (the Great-Expectations / dbt-test shape,
  * expressed as Spark aggregations): each rule audits one invariant
  * and the whole suite reports violation counts in as few passes as
  * the rule mix allows. Next to [[Profile.profile]] (which DESCRIBES a
  * frame) this JUDGES it: a feed whose null rate, domain, range, or
  * key uniqueness drifted fails loudly at the gate instead of
  * corrupting everything downstream.
  */
object Quality {

  /** One row-level expectation: `name` labels the report row,
    * `column` is informational, `predicate` must hold for every row
    * (NULL predicate results count as violations — an unknown is not
    * a pass). */
  final case class Rule(name: String, column: String, predicate: Column)

  def notNull(c: String): Rule =
    Rule(s"not_null($c)", c, col(c).isNotNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c)", c, col(c) >= lo && col(c) <= hi)

  def acceptedValues(c: String, values: Seq[String]): Rule =
    Rule(s"accepted_values($c)", c, col(c).isin(values: _*))

  def matchesRegex(c: String, re: String): Rule =
    Rule(s"matches_regex($c)", c, col(c).rlike(re))

  /** Evaluate all row-level rules in ONE algebraic aggregation pass
    * (each rule is a `sum(violation-indicator)` — partial aggregation
    * map-side, one scan of the frame regardless of rule count), plus
    * one `groupBy` pass per `uniqueKeys` entry (uniqueness is not
    * row-local; its violation count = rows carrying a key that occurs
    * more than once). Output, one row per rule:
    * (`rule`, `column`, `n_checked`, `n_violations`, `pass`).
    *
    * `pass` compares the violation RATE against `maxViolationRate`
    * (default 0 — strict): tolerant gates for known-dirty feeds
    * without letting "a few bad rows" quietly become "half the
    * shard". */
  def check(
      df: DataFrame,
      rules: Seq[Rule],
      uniqueKeys: Seq[Seq[String]] = Nil,
      maxViolationRate: Double = 0.0): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "no expectations given")
    require(maxViolationRate >= 0.0 && maxViolationRate < 1.0,
      s"maxViolationRate ($maxViolationRate) must be in [0, 1)")
    val dupNames = rules.map(_.name).diff(rules.map(_.name).distinct)
    require(dupNames.isEmpty,
      s"duplicate rule names: ${dupNames.distinct.mkString(", ")}")

    val rowLevel: Option[DataFrame] = if (rules.isEmpty) None else Some {
      val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
        case (r, i) =>
          // NULL predicate -> violation: when(pred, 0) otherwise 1
          sum(when(r.predicate, 0L).otherwise(1L)).as(s"__v$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val entries = rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"), lit(r.column).as("column"),
          col("__n").as("n_checked"), col(s"__v$i").as("n_violations"))
      }
      one.select(explode(array(entries: _*)).as("__e")).select(col("__e.*"))
    }
    val keyLevel: Seq[DataFrame] = uniqueKeys.map { keys =>
      require(keys.nonEmpty, "empty unique-key column list")
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)).as("n_checked"),
          coalesce(sum(when(col("__c") > 1L, col("__c")).otherwise(0L)),
            lit(0L)).as("n_violations"))
        .select(lit(s"unique_key(${keys.mkString(",")})").as("rule"),
          lit(keys.mkString(",")).as("column"),
          col("n_checked"), col("n_violations"))
    }
    val all = (rowLevel.toSeq ++ keyLevel).reduce(_.unionByName(_))
    all.withColumn("pass",
      col("n_violations").cast("double") <=
        lit(maxViolationRate) * col("n_checked").cast("double"))
  }

  /** Blocklist phrase gate — the content-filter stage of a corpus
    * pipeline (NSFW/toxicity/keyword policies, CCNet-style "bad word"
    * lists): every document audited against a term list of single
    * tokens AND space-joined multi-token phrases, matched at TOKEN
    * granularity — "ass" must not hit "class", which is why this is a
    * token-stream join and not a substring scan. Returns one row per
    * input document: total hit count (every occurrence), distinct
    * matched terms, and the over-threshold flag — counts, not just a
    * boolean, because a policy that drops at 1 hit and a policy that
    * down-weights at 5 read the same audit.
    *
    * Scale shape: candidate n-grams are built MAP-ONLY per document
    * (one `transform` over positions per distinct phrase width in the
    * term list — a width the list doesn't use is never generated);
    * the term list is an explicit `broadcast` (it is small by nature —
    * policies are human-curated), so the corpus never shuffles to
    * match; the per-doc rollup is one map-side-combined aggregation
    * on doc id; clean docs re-enter through a left join so the audit
    * covers every document, not just the dirty ones.
    *
    * Terms must be non-empty, single-space-joined, and duplicate-free
    * — a corrupted policy file fails here, not as wrong counts. */
  def blocklistAudit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      maxHits: Long = 0L): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    require(maxHits >= 0L, s"maxHits ($maxHits) must be >= 0")
    terms.foreach { t =>
      require(t.trim == t && t.nonEmpty && !t.contains("  "),
        s"blocklist term '$t' must be non-empty, trimmed, single-spaced")
    }
    require(terms.distinct.size == terms.size,
      s"duplicate blocklist terms: ${terms.diff(terms.distinct).mkString(", ")}")
    import graft.functions.TextFunctions
    val spark = df.sparkSession
    import spark.implicits._
    val termDf = terms.toDF("__gram")
    val toks = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val widths = terms.map(_.split(" ").length).distinct.sorted
    val cand = widths.map { w =>
      toks.filter(size(col("__toks")) >= w)
        .select(col(idCol),
          explode(transform(sequence(lit(0), size(col("__toks")) - w),
            i => array_join(slice(col("__toks"), i + 1, lit(w)), " ")))
            .as("__gram"))
    }.reduce(_ unionAll _)
    val hits = cand.join(broadcast(termDf), Seq("__gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("__gram")).as("n_terms"))
    df.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        (coalesce(col("n_hits"), lit(0L)) > maxHits).as("flagged"))
  }

  /** Default PII pattern set for [[piiScan]]: (category, regex). Kept
    * deliberately in the common Java-regex/RE2 subset (character
    * classes, bounded repetition, `\b`/`\d` — no lookaround, no
    * backreferences) so the identical pattern string runs on Spark,
    * DuckDB/RE2, and any downstream policy engine with the same
    * leftmost non-overlapping match semantics. */
  val defaultPiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "url" -> "https?://[A-Za-z0-9./_%-]+",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b")

  /** PII-pattern scan — the pre-training privacy screen every corpus
    * pipeline runs before anything else sees the text: per document,
    * the number of non-overlapping matches of each pattern category
    * (emails, URLs, IPv4 literals, phone-shaped digit runs by
    * default), the total, and a `has_pii` flag for the filter
    * downstream. Counting (not just flagging) matters operationally: a
    * doc with 400 emails is a scraped directory to drop, a doc with
    * one is a signature to redact.
    *
    * Scale shape: pure per-row `regexp_count` — codegen'd, no shuffle,
    * no UDF; the whole scan fuses into the read stage. Category names
    * must be distinct, non-empty, and column-safe (they become output
    * columns `<name>_hits`). Patterns are compiled eagerly so a bad
    * regex fails at plan time, not per-task at run time.
    *
    * Output: (`idCol`, `<cat>_hits`..., `pii_total`, `has_pii`). */
  def piiScan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[(String, String)] = defaultPiiPatterns): DataFrame = {
    require(patterns.nonEmpty, "piiScan needs at least one pattern")
    require(patterns.map(_._1).distinct.size == patterns.size,
      s"duplicate pattern categories: ${patterns.map(_._1).mkString(", ")}")
    patterns.foreach { case (cat, re) =>
      require(cat.nonEmpty && cat.matches("[A-Za-z0-9_]+"),
        s"category '$cat' must be a column-safe identifier")
      java.util.regex.Pattern.compile(re) // fail at plan time, loudly
    }
    val hitCols = patterns.map { case (cat, re) =>
      coalesce(regexp_count(col(textCol), lit(re)), lit(0))
        .cast("long").as(s"${cat}_hits")
    }
    val totalExpr = patterns.map { case (cat, _) =>
      col(s"${cat}_hits")
    }.reduce(_ + _)
    df.select((col(idCol) +: hitCols): _*)
      .withColumn("pii_total", totalExpr)
      .withColumn("has_pii", col("pii_total") > 0L)
  }

  /** Order-independent table fingerprint — the cross-engine checksum
    * that validates a 100 TB copy/migration/backfill WITHOUT sorting:
    * each row canonicalizes to a delimited string (NULL marked
    * distinctly from the empty string, so `(NULL, "x")` and
    * `("", "x")` differ), hashes through the portable 64-bit md5 hash,
    * and the fingerprint is the plain SUM of row hashes as
    * DECIMAL(38,0) — commutative, so partition order, shuffle order,
    * and engine choice cannot move it, and any single-row change
    * almost surely does (the sum is not collision-proof against an
    * adversary; it is a pipeline-integrity check, not a MAC).
    *
    * Column cast caveat, stated loudly: canonicalization is
    * `CAST(col AS STRING)`, which is only engine-portable for
    * integers, strings, booleans, and dates — float/double/timestamp
    * renderings differ across engines, so fingerprint those through an
    * explicit decimal/epoch canonicalization FIRST. This is checked:
    * non-portable column types are refused at plan time.
    *
    * Scale shape: one map-side-combined aggregation, no sort, no
    * shuffle beyond the single-row final combine. Output: one row —
    * (`n_rows`, `fingerprint` DECIMAL(38,0)). */
  def tableFingerprint(
      df: DataFrame,
      cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    require(cols.nonEmpty, "tableFingerprint needs columns")
    cols.foreach { c =>
      val t = df.schema(c).dataType
      require(Seq[DataType](ByteType, ShortType, IntegerType, LongType,
          StringType, BooleanType, DateType).contains(t) ||
          t.isInstanceOf[DecimalType],
        s"tableFingerprint: column '$c' is $t — CAST TO STRING is not " +
          "engine-portable for this type; canonicalize it explicitly " +
          "(decimal for floats, epoch integer for timestamps) first")
    }
    // \u0001 separates fields (so ("ab","c") and ("a","bc") differ);
    // \u0002 marks NULL (distinct from the empty string); both render
    // as one identical UTF-8 byte on either engine
    val canon = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    df.select(graft.functions.TextFunctions.portableTokenHash64(canon)
        .as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("__h").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("fingerprint"))
  }

  /** Incremental [[tableFingerprint]] maintenance — the point of a
    * COMMUTATIVE checksum: after a CDC batch, the new fingerprint is
    * `fp_old + Σhash(inserted) − Σhash(deleted)` — an update costs one
    * pass over the DELTA, never a rescan of the 100 TB base (the
    * [[Maintain]] algebraic-merge discipline applied to integrity
    * checking; an UPDATE is its old row in `deleted` plus its new row
    * in `inserted`). Returns one row — (`n_inserted`, `n_deleted`,
    * `delta` DECIMAL(38,0)) — to fold into the stored fingerprint.
    * Same column-portability contract as [[tableFingerprint]]. */
  def tableFingerprintDelta(
      inserted: DataFrame,
      deleted: DataFrame,
      cols: Seq[String]): DataFrame = {
    val ins = tableFingerprint(inserted, cols)
      .select(col("n_rows").as("n_inserted"),
        col("fingerprint").as("__fi"))
    val del = tableFingerprint(deleted, cols)
      .select(col("n_rows").as("n_deleted"),
        col("fingerprint").as("__fd"))
    // two one-row frames: union-and-fold, never a joined plan shape
    ins.select(col("n_inserted"), lit(0L).as("n_deleted"),
        col("__fi").as("__f"))
      .unionByName(del.select(lit(0L).as("n_inserted"),
        col("n_deleted"), (-col("__fd")).as("__f")))
      .agg(sum(col("n_inserted")).as("n_inserted"),
        sum(col("n_deleted")).as("n_deleted"),
        sum(col("__f")).cast("decimal(38,0)").as("delta"))
  }

  /** Functional-dependency audit — the "one key, one fact" contract
    * ([[referentialIntegrity]]'s intra-table sibling): does
    * `lhs → rhs` hold, i.e. does every distinct `lhs` tuple map to
    * exactly one `rhs` tuple? Violations are the classic silent
    * corruption of merged/backfilled dimensions (one customer id, two
    * nations) that row-local [[check]] rules cannot see. Returns ONE
    * summary row — lhs groups, violating groups, violating rows, and
    * the worst group's distinct-rhs count — because the fix for "3
    * groups disagree" (patch them) differs from "40% disagree" (the
    * dependency is simply false).
    *
    * NULL semantics, stated: NULL lhs tuples form their own group
    * (audited like any other); distinct-rhs counting treats NULL as a
    * value (`(1, NULL)` and `(1, 'x')` is a violation).
    *
    * Scale shape: ONE map-side-combined aggregation on lhs (distinct
    * rhs per group via a two-level group-by), then a group-bounded
    * rollup — no join, no window. Output: (`n_groups`,
    * `n_violating_groups`, `n_violating_rows`, `max_rhs_variants`). */
  def functionalDependencyAudit(
      df: DataFrame,
      lhs: Seq[String],
      rhs: Seq[String]): DataFrame = {
    require(lhs.nonEmpty && rhs.nonEmpty,
      "functionalDependencyAudit needs lhs and rhs columns")
    require(lhs.intersect(rhs).isEmpty,
      s"lhs and rhs overlap: ${lhs.intersect(rhs).mkString(", ")}")
    val perPair = df.groupBy((lhs ++ rhs).map(col): _*)
      .agg(count(lit(1)).as("__rows"))
    val perGroup = perPair.groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("__variants"), sum(col("__rows")).as("__n"))
    perGroup.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("__variants") > 1, 1L).otherwise(0L))
        .as("n_violating_groups"),
      coalesce(sum(when(col("__variants") > 1, col("__n"))), lit(0L))
        .as("n_violating_rows"),
      coalesce(max(col("__variants")), lit(0L)).as("max_rhs_variants"))
  }

  /** Referential-integrity audit — the foreign-key contract [[check]]
    * cannot express with row-local predicates: every child row's key
    * should resolve in the parent ("no order without its customer").
    * Returns ONE summary row per call: child rows checked, orphan rows
    * (child key unmatched in parent), distinct orphan key values, and
    * the orphan rate — counts, not a boolean, because the fix for
    * "0.01% orphans" (quarantine them) differs from the fix for "40%
    * orphans" (the join key is wrong).
    *
    * NULL child keys are counted separately (`n_null_keys`) and are
    * NOT orphans — SQL FK semantics: a NULL reference is "unknown",
    * not "dangling"; conflating them hides real breakage under benign
    * optional references.
    *
    * Scale shape: parent reduced to DISTINCT keys first (key-bounded),
    * then ONE left join of the child's key projection, unhinted — AQE
    * broadcasts real dimension key sets, and a huge parent degrades to
    * a shuffle join instead of an OOM. Aggregation is algebraic.
    *
    * Output: (relation, n_child, n_null_keys, n_orphans,
    * n_orphan_keys, orphan_rate). */
  def referentialIntegrity(
      child: DataFrame,
      childKeys: Seq[String],
      parent: DataFrame,
      parentKeys: Seq[String],
      relation: String): DataFrame = {
    require(childKeys.nonEmpty, "referentialIntegrity needs child key columns")
    require(childKeys.size == parentKeys.size,
      s"key arity mismatch: ${childKeys.size} child vs ${parentKeys.size} parent")
    val pk = parent.select(parentKeys.zipWithIndex.map {
        case (c, i) => col(c).as(s"__pk$i")
      }: _*).distinct().withColumn("__hit", lit(true))
    val ck = child.select(childKeys.zipWithIndex.map {
      case (c, i) => col(c).as(s"__ck$i")
    }: _*)
    val anyNull = childKeys.indices.map(i => col(s"__ck$i").isNull)
      .reduce(_ || _)
    val joinCond = childKeys.indices.map(i => col(s"__ck$i") === col(s"__pk$i"))
      .reduce(_ && _)
    val joined = ck.join(pk, joinCond, "left")
    val orphan = !anyNull && col("__hit").isNull
    joined.agg(
        count(lit(1)).as("n_child"),
        sum(when(anyNull, 1L).otherwise(0L)).as("n_null_keys"),
        sum(when(orphan, 1L).otherwise(0L)).as("n_orphans"),
        count_distinct(when(orphan,
          struct(childKeys.indices.map(i => col(s"__ck$i")): _*)))
          .as("n_orphan_keys"))
      .select(lit(relation).as("relation"), col("n_child"),
        col("n_null_keys"), col("n_orphans"), col("n_orphan_keys"),
        (col("n_orphans").cast("double") / col("n_child").cast("double"))
          .as("orphan_rate"))
  }

  /** k-anonymity audit over a quasi-identifier column set — the
    * re-identification-risk companion to the PII scrubbing family
    * ([[graft.functions.TextFunctions]] redaction removes DIRECT
    * identifiers; this measures whether the remaining quasi-identifier
    * combinations still single people out): a row is k-anonymous when
    * at least `k` rows share its full quasi-identifier tuple, so every
    * equivalence class smaller than `k` is a disclosure risk. Returns
    * the CLASS-SIZE PROFILE — one row per distinct class size with the
    * number of classes and rows at that size and the `at_risk` flag —
    * because "3 classes of size 1" is the actionable reading (which
    * generalization to coarsen), not a single pass/fail bit.
    *
    * Scale shape: one map-side-combined aggregation onto the
    * quasi-identifier classes (class-bounded exchange), then a second
    * aggregation onto distinct class SIZES (at most a few hundred
    * values regardless of table size). NULL quasi-identifier values
    * form their own class (groupBy semantics) — NULL is a value an
    * attacker can match on too.
    *
    * Output: (group_size, n_groups, n_rows, at_risk), size ascending
    * risk first. */
  def kAnonymityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit needs quasi-identifier columns")
    require(k >= 2L, s"k ($k) must be >= 2 — k=1 is vacuously satisfied")
    val missing = quasiCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"quasi-identifier columns not in frame: ${missing.mkString(", ")}")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__sz")).as("n_rows"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** Wilson score interval on a per-group pass rate — the honest way
    * to report a quality gate's rate from a finite sample ("93% of
    * this source passes, but it's 93% OF FIFTEEN DOCS"): for each
    * group, the boolean flag's success count, rate, and the Wilson
    * interval `(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)` —
    * unlike the naive normal interval it never leaves [0, 1] and
    * stays calibrated at extreme rates and small n, which is exactly
    * the regime per-source QA slices live in. NULL flags are EXCLUDED
    * (an unevaluated row is not a failure); a group with only NULL
    * flags keeps its row with n = 0 and NULL rate/bounds.
    *
    * One map-side-combined aggregation (group-bounded output) + a
    * map-only closed form; bounds round at 6 (engine-portable).
    * Output: (groups..., `n`, `n_pass`, `rate6`, `lo6`, `hi6`). */
  def passRateCI(
      df: DataFrame,
      groupCols: Seq[String],
      flagCol: String,
      z: Double = 1.96): DataFrame = {
    require(groupCols.nonEmpty, "passRateCI needs group columns")
    require(z > 0.0, s"z ($z) must be positive")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(col(flagCol)).as("n"), // count() skips NULL flags
        sum(when(col(flagCol) === true, 1L).otherwise(0L)).as("n_pass"))
    passRateCIFromCounts(agg, groupCols, z)
  }

  /** [[passRateCI]]'s interval arithmetic over a prepared count table
    * (`groups..., n, n_pass`) — shared verbatim by the batch operator
    * and streaming monitors whose per-group counts fold by SUM. */
  private[graft] def passRateCIFromCounts(
      agg: DataFrame,
      groupCols: Seq[String],
      z: Double): DataFrame = {
    val nD = col("n").cast("double")
    val p = col("n_pass").cast("double") / nD
    val z2 = lit(z * z)
    val center = p + z2 / (lit(2.0) * nD)
    val spread = lit(z) *
      sqrt(p * (lit(1.0) - p) / nD + z2 / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + z2 / nD
    agg.select(groupCols.map(col) ++ Seq(
      col("n"), col("n_pass"),
      when(col("n") > 0, round(p, 6)).as("rate6"),
      when(col("n") > 0, round((center - spread) / denom, 6)).as("lo6"),
      when(col("n") > 0, round((center + spread) / denom, 6)).as("hi6")): _*)
  }
}
