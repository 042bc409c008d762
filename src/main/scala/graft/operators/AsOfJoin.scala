package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (nearest-event) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (no custom
  * Strategy needed): tag both sides, union, ONE hash shuffle + sort per
  * key, and a running `last(ignoreNulls)` window carries the most
  * recent right-side payload onto each left row.
  *
  * This is the merge-join formulation of as-of: cost is one shuffle of
  * |L|+|R| rows and a per-key sort — no row ever compares against more
  * than its predecessors, so it scales to arbitrarily large sides
  * (contrast with the O(|L|·|R|) theta-join a naive MAX-subquery plan
  * produces). Skew on a hot key degrades to that key's partition only.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * `right.timeCol <= left.timeCol` (backward as-of, inclusive ties)
    * on equal `keys`. Right columns arrive prefixed with `rightPrefix`;
    * unmatched left rows keep nulls. `toleranceUs`, when set, voids
    * matches older than the tolerance (microseconds).
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {

    val rvStruct = struct((rightTime +: rightValues).map(col): _*)
    val rvType = StructType(
      (rightTime +: rightValues).map(c => right.schema(c)))

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        rvStruct.as("__rv")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val unioned = l.select(r.columns.map(col): _*).unionByName(r)
    // NB: l reordered to r's column layout; both carry all needed cols.

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = unioned
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // Tolerance works on both timestamp and numeric time axes.
    def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val withinTol: Column = toleranceUs match {
      case Some(tol) => when(
        col("__match").isNotNull &&
          micros(col("__t"), left.schema(leftTime).dataType) -
            micros(col("__match")(rightTime), right.schema(rightTime).dataType) <= tol,
        col("__match"))
      case None => col("__match")
    }

    val out = matchedRaw.withColumn("__m", withinTol)
    val rightOut = (rightTime +: rightValues).map(c =>
      col("__m")(c).as(s"$rightPrefix$c"))
    out.select(leftCols.map(col) ++ rightOut: _*)
  }

  /** Forward as-of: latest-earliest right row with
    * `right.timeCol >= left.timeCol`. Same machinery on the reversed
    * time axis. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {
    val negL = left.withColumn("__negt", expr(s"-unix_micros($leftTime)"))
    val negR = right.withColumn("__negt", expr(s"-unix_micros($rightTime)"))
    asofBackward(negL, negR, keys, "__negt", "__negt",
      rightValues :+ rightTime, rightPrefix,
      toleranceUs)
      .drop("__negt")
      .drop(s"${rightPrefix}__negt")
  }

  /** Nearest as-of: for each left row, the right row minimizing
    * |right.time − left.time| on equal keys — pandas
    * `merge_asof(direction='nearest')`, completing the
    * backward/forward/nearest surface. Ties between an equally-distant
    * past and future match go BACKWARD (the pandas convention, and the
    * causality-preserving default). `toleranceUs` bounds the distance
    * on BOTH sides.
    *
    * Composed as [[asofBackward]] then [[asofForward]] chained on the
    * same left frame — each pass preserves left cardinality (left
    * semantics), so no synthetic row id is needed to zip the two
    * candidates — followed by a map-only per-row pick. Cost is exactly
    * two as-of passes (two key shuffles); the pick adds nothing. */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {
    val b = asofBackward(left, right, keys, leftTime, rightTime,
      rightValues, "__gb_", toleranceUs)
    val bf = asofForward(b, right, keys, leftTime, rightTime,
      rightValues, "__gf_", toleranceUs)
    def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val lt = micros(col(leftTime), left.schema(leftTime).dataType)
    val rdt = right.schema(rightTime).dataType
    val bt = micros(col(s"__gb_$rightTime"), rdt)
    val ft = micros(col(s"__gf_$rightTime"), rdt)
    val useB = col(s"__gb_$rightTime").isNotNull &&
      (col(s"__gf_$rightTime").isNull || (lt - bt) <= (ft - lt))
    val outRight = (rightTime +: rightValues).map(c =>
      when(useB, col(s"__gb_$c")).otherwise(col(s"__gf_$c"))
        .as(s"$rightPrefix$c"))
    bf.select(left.columns.toSeq.map(col) ++ outRight: _*)
  }

  /** SCD Type-2 POINT-IN-TIME join: each fact row joins the dimension
    * VERSION whose validity interval `[validFrom, validTo)` contains
    * the fact's event time — the label-leakage firewall of feature
    * generation (a training example must see the dimension as it was
    * at event time, not as it is today), and the batch twin of
    * [[graft.streaming.EventStream.enrichStream]]'s latest-version
    * semantics.
    *
    * Plan shape: the equi key carries the hash join (facts shuffle on
    * the key they already group by; a dimension small enough
    * broadcasts via AQE — the join is UNHINTED), and the interval
    * predicate rides the join condition as a post-probe filter — never
    * a theta join, because versions-per-key is bounded (an SCD
    * dimension grows by UPDATES, a handful of versions per key),
    * so probing a key's version list is O(versions), not O(|dim|).
    *
    * Correctness guard: with `checkNonOverlap` (default), the
    * dimension's versions are audited per key — `validFrom <
    * validTo` and no interval overlapping its predecessor (window lag
    * per key, dimension-bounded) — and a violation raises loudly
    * mid-scan. Overlap is the corruption that silently DUPLICATES
    * facts through this join; the guard makes it fail instead. LEFT
    * semantics: a fact no version covers keeps nulls (gap visibility),
    * it never disappears. */
  def scdJoin(
      facts: DataFrame,
      factKey: String,
      factTime: String,
      dim: DataFrame,
      dimKey: String,
      validFrom: String,
      validTo: String,
      checkNonOverlap: Boolean = true): DataFrame = {
    val audited =
      if (!checkNonOverlap) dim
      else {
        val w = Window.partitionBy(col(dimKey)).orderBy(col(validFrom))
        dim.withColumn("__prev_to", lag(col(validTo), 1).over(w))
          .filter(
            when(col(validFrom) < col(validTo) &&
                (col("__prev_to").isNull || col("__prev_to") <= col(validFrom)),
              lit(true))
            .otherwise(raise_error(concat(
              lit("scdJoin: dimension versions for key "),
              col(dimKey).cast("string"),
              lit(" are empty or overlapping around validFrom "),
              col(validFrom).cast("string"),
              lit(" — overlapping SCD intervals silently duplicate facts")))
              .cast("boolean")))
          .drop("__prev_to")
      }
    val f = facts.alias("f")
    val d = audited.alias("d")
    val dimAttrs = audited.columns
      .filterNot(Set(dimKey, validFrom, validTo)).toSeq
    f.join(d,
        col(s"f.$factKey") === col(s"d.$dimKey") &&
          col(s"f.$factTime") >= col(s"d.$validFrom") &&
          col(s"f.$factTime") < col(s"d.$validTo"),
        "left")
      .select(facts.columns.map(c => col(s"f.$c")) ++
        dimAttrs.map(c => col(s"d.$c")): _*)
  }

  /** SCD Type-2 dimension BUILD from a change feed — the producer half
    * of [[scdJoin]]'s consumer: raw change records `(key, ts, attrs…)`
    * become the versioned dimension `(key, attrs…, validFrom,
    * validTo)` whose half-open intervals tile each key's timeline from
    * its first change to `endOfTime`. Together they close the
    * feature-store loop: CDC feed → `scdBuild` → `scdJoin(facts, …)`.
    *
    * Semantics, in order:
    *   1. Same-timestamp conflicts: among changes sharing `(key, ts)`
    *      the LAST WRITE WINS — the row ranking highest under
    *      `tieBreak` ascending survives. With no `tieBreak` given,
    *      duplicate `(key, ts)` rows are CORRUPTION and raise loudly
    *      (an arbitrary winner would silently pick a version history).
    *   2. No-op collapse: a change whose attrs null-safely equal the
    *      surviving predecessor state opens no version — CDC feeds
    *      re-emit unchanged rows (heartbeats, full-row triggers) and a
    *      spurious version per heartbeat would bloat the dimension
    *      without changing any join result.
    *   3. Intervals: `validFrom` = the change's ts, `validTo` = the
    *      key's next (surviving) change ts, `endOfTime` for the
    *      current version. Adjacent versions touch exactly, so the
    *      output passes [[scdJoin]]'s non-overlap audit by
    *      construction.
    *
    * Plan shape: ONE hash shuffle on `key` carries all three steps —
    * the conflict-dedup window sorts `(ts, tieBreak desc)`, whose `ts`
    * prefix also satisfies the collapse and lead windows, so Catalyst
    * reuses both the exchange and the sort. Per-key state never leaves
    * the executor; cost is |changes| log(changes-per-key), exactly the
    * [[asofBackward]] discipline. Works on timestamp or numeric time
    * axes (anything `<`-ordered).
    */
  def scdBuild(
      changes: DataFrame,
      key: String,
      ts: String,
      attrs: Seq[String],
      endOfTime: Column,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(attrs.nonEmpty, "scdBuild needs at least one attribute column")
    val ordDedup = col(ts) +: tieBreak.map(c => col(c).desc)
    val wDedup = Window.partitionBy(col(key)).orderBy(ordDedup: _*)
    // First row of each ts-run under (ts asc, tieBreak desc) = the
    // max-tieBreak row for that (key, ts) — last write wins without a
    // second (key, ts)-partitioned exchange.
    val prevTs = lag(col(ts), 1).over(wDedup)
    val winners = changes
      .withColumn("__dup", prevTs.isNotNull && prevTs === col(ts))
      .filter(
        if (tieBreak.nonEmpty) !col("__dup")
        else when(!col("__dup"), lit(true)).otherwise(
          raise_error(concat(
            lit("scdBuild: duplicate change rows for key "),
            col(key).cast("string"), lit(" at ts "),
            col(ts).cast("string"),
            lit(" with no tieBreak — an arbitrary winner would silently pick a version history")))
            .cast("boolean")))
      .drop("__dup")
    val state = struct(attrs.map(col): _*)
    val wKey = Window.partitionBy(col(key)).orderBy(col(ts))
    val opened = winners
      .withColumn("__prev_state", lag(state, 1).over(wKey))
      .filter(col("__prev_state").isNull || !(col("__prev_state") <=> state))
      .drop("__prev_state")
    opened
      .withColumn("__valid_to",
        coalesce(lead(col(ts), 1).over(wKey), endOfTime))
      .select((col(key) +: attrs.map(col)) ++ Seq(
        col(ts).as("valid_from"), col("__valid_to").as("valid_to")): _*)
  }

  /** SCD Type-1 state-table maintenance — the CDC MERGE apply: fold a
    * change shard (`upsert` / `delete` ops) into a keyed snapshot,
    * latest-wins per key, and return the next snapshot in the SAME
    * `(key, attrs…, ts)` shape so shard N+1 folds into the result —
    * the incremental-materialization primitive next to [[scdBuild]]'s
    * full-history build, and the serving-table analog of the dedup
    * ledger fold (q87/q109): ingesting shard N reads the compact
    * snapshot, never shards 1…N-1.
    *
    * Winner per key = the row ranking highest under
    * `(ts, state-beats-nothing, tieBreak)`: a change at the same `ts`
    * as the standing state row WINS (the state row was produced by an
    * earlier shard; the change is newer information), and two CHANGES
    * tied on `(ts, tieBreak)` are corruption and raise loudly —
    * exactly [[scdBuild]]'s determinism contract. A `delete` winner
    * removes the key from the snapshot; any other `op` value raises.
    *
    * CONTRACT — monotone shards: deletes are applied physically (no
    * tombstone survives into the snapshot), so a key's changes must
    * not arrive in an EARLIER shard with a LATER timestamp than a
    * subsequent shard's (within one shard, any order is fine — the
    * window sorts it). Time-split shards (the normal CDC shape)
    * satisfy this by construction.
    *
    * Plan shape: one hash shuffle of |state| + |shard| on `key` + a
    * per-key sort carries winner selection, the ambiguity audit, and
    * the delete filter; per-key cost is its change count, skew
    * degrades to the hot key's partition only.
    */
  def applyChanges(
      state: DataFrame,
      changes: DataFrame,
      key: String,
      ts: String,
      opCol: String,
      attrs: Seq[String],
      tieBreak: Seq[String] = Nil,
      upsertOp: String = "upsert",
      deleteOp: String = "delete"): DataFrame = {
    require(attrs.nonEmpty, "applyChanges needs at least one attribute column")
    val tbTypes = tieBreak.map(c => changes.schema(c).dataType)
    val chg = changes.select(
      col(key) +: col(ts) +:
        when(col(opCol) === upsertOp || col(opCol) === deleteOp, col(opCol))
          .otherwise(raise_error(concat(
            lit(s"applyChanges: op must be '$upsertOp' or '$deleteOp', got '"),
            col(opCol).cast("string"), lit("' for key "),
            col(key).cast("string"))))
          .as("__op") +:
        lit(1).as("__src") +:
        (attrs.map(col) ++ tieBreak.map(col)): _*)
    val st = state.select(
      col(key) +: col(ts) +: lit(upsertOp).as("__op") +: lit(0).as("__src") +:
        (attrs.map(col) ++
          tieBreak.zip(tbTypes).map { case (c, t) => lit(null).cast(t).as(c) }): _*)
    val all = st.unionByName(chg)
    val ord = (col(ts).desc +: col("__src").desc +: tieBreak.map(col(_).desc))
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
    val rankTuple = struct(col(ts) +: col("__src") +: tieBreak.map(col): _*)
    val nextTuple = lead(rankTuple, 1).over(w)
    all
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next", nextTuple)
      .filter(col("__rn") === 1)
      .filter(
        when(col("__next").isNull || !(col("__next") <=> rankTuple), lit(true))
          .otherwise(raise_error(concat(
            lit("applyChanges: two changes for key "),
            col(key).cast("string"), lit(" tie at ts "),
            col(ts).cast("string"),
            lit(" under the given tieBreak — an arbitrary winner would silently pick a state")))
            .cast("boolean")))
      .filter(col("__op") === upsertOp)
      .select(col(key) +: attrs.map(col) :+ col(ts): _*)
  }
}
