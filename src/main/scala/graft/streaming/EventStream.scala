package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface: file-source streams over the same
  * event schema the batch operators use, windowed aggregation with
  * watermarking, and stateful gap sessionization via
  * flatMapGroupsWithState. The reference has no streaming at all
  * (SURVEY.md §2.3); this extends the engine so the same pipeline
  * semantics run incrementally.
  */
object EventStream {

  /** Typed event for the stateful operators. */
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  /** Closed session emitted by the stateful sessionizer. */
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, value_sum: Double)

  /** Open-session state carried in the state store (public: Catalyst's
    * generated code must reach the accessors). */
  final case class SessionState(startUs: Long, lastUs: Long,
      n: Long, valueSum: Double)

  /** File-source stream: each new parquet file in `dir` becomes a
    * micro-batch. Schema must be supplied (streaming sources don't
    * infer). */
  def readEventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Event-time windowed counts with a watermark: state for windows
    * older than the watermark is dropped, which bounds state size on an
    * unbounded stream — the knob that makes this viable at 100 TB/day.
    * The value sum accumulates through DECIMAL(18,2): exact and
    * order-independent, so a replayed stream, the batch twin, and an
    * external oracle all produce the bit-identical double.
    */
  def windowedCounts(
      events: DataFrame,
      windowDur: String = "5 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("value_sum"))

  /** Streaming per-window top-k heavy users — "what's trending NOW"
    * over an unbounded feed: per tumbling window, the k users with the
    * most events, exact (not sketched). Two CHAINED stateful
    * aggregations (Spark's multiple-stateful-operator support, keyed
    * by `window_time` so the watermark propagates): the first counts
    * per (window, user) — state one row per active pair inside the
    * horizon; the second reduces each window to its bounded
    * [[graft.functions.Aggregators.TopK]] heap — state k rows per open
    * window, NEVER the user cardinality, which is what makes exact
    * per-window ranking viable when a window holds millions of
    * distinct users. Emission on watermark close; ranks are dense and
    * deterministic (count desc, user id asc — the heap's order). */
  def topUsersPerWindowStream(
      events: DataFrame,
      k: Int,
      windowDur: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(k > 0, "k must be positive")
    val topk = udaf(new graft.functions.Aggregators.TopK(k),
      Encoders.product[graft.functions.Aggregators.Scored])
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("window")), windowDur).as("window"))
      .agg(topk(col("n").cast("double"), col("user_id")).as("__top"))
      .select(col("window"), posexplode(col("__top")).as(Seq("__r", "__e")))
      .select(col("window"), (col("__r") + 1).as("rank"),
        col("__e.id").as("user_id"), col("__e.score").cast("long").as("n"))
  }

  /** Streaming exact dedup: drop events whose `keyCols` were already
    * seen within the watermark horizon. Spark's streaming
    * `dropDuplicates` keeps one state row per distinct key; the
    * watermark on the event-time column lets it EXPIRE state for keys
    * older than the horizon — without it, state grows without bound and
    * a 100 TB/day stream eventually OOMs the state store. This is the
    * incremental twin of [[graft.operators.Dedup.exactDedup]]. */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Microsecond-exact epoch extraction — `Timestamp.getTime` alone is
    * millisecond-truncated, which would make stream session boundaries
    * diverge from the µs-precision batch operator on sub-ms data. */
  private[streaming] def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private[streaming] def tsFromMicros(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Stateful gap sessionization: one GroupState per user carries the
    * open session; events beyond `gapUs` close it and emit. All time
    * arithmetic is µs-exact, so the emitted sessions match
    * [[graft.operators.Sessionize.sessionize]] boundary-for-boundary.
    * State is O(active users), not O(events).
    *
    * On an unbounded production stream a user's LAST session never
    * closes — no later event arrives to cross the gap — so pass
    * `idleTimeout` (e.g. "2 hours", sensibly >= the gap): a user idle
    * that long (PROCESSING time, the operational proxy for the
    * event-time gap) has their open session closed, emitted exactly
    * once, and removed from the store — the session a later
    * out-of-gap event would have closed anyway, just not held hostage
    * to that event ever arriving. The same WARNING as
    * [[funnelStream]] applies verbatim: `ProcessingTimeTimeout` keeps
    * `Trigger.AvailableNow`/`Once` replays scheduling empty
    * micro-batches until every registered timeout expires, so bounded
    * replay gates (whose sentinels already close every session) must
    * leave it None. */
  def sessionizeStream(
      events: Dataset[Event],
      gapUs: Long,
      idleTimeout: Option[String] = None): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle expiry closes the open session: emit it once, drop
            // the key — the store stays O(currently-active users)
            val st = state.get
            state.remove()
            Iterator.single(Session(userId,
              tsFromMicros(st.startUs), tsFromMicros(st.lastUs), st.n, st.valueSum))
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val us = micros(e.ts)
              cur match {
                case Some(st) if us - st.lastUs <= gapUs =>
                  cur = Some(st.copy(lastUs = us, n = st.n + 1, valueSum = st.valueSum + e.value))
                case Some(st) =>
                  closed += Session(userId,
                    tsFromMicros(st.startUs), tsFromMicros(st.lastUs), st.n, st.valueSum)
                  cur = Some(SessionState(us, us, 1L, e.value))
                case None =>
                  cur = Some(SessionState(us, us, 1L, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            closed.result().iterator
          }
      }
  }

  /** Funnel progress emitted by the stateful streaming funnel. */
  final case class FunnelResult(user_id: Long, steps_reached: Int,
      t1_us: Long, tk_us: Option[Long], delay_us: Option[Long])

  /** Per-user funnel progress carried in the state store. */
  final case class FunnelState(stage: Int, t1Us: Long, lastUs: Long,
      emitted: Boolean)

  /** Stateful streaming funnel: the incremental twin of
    * [[graft.operators.Events.funnelSorted]] — one GroupState per user
    * carries the greedy-chain progress (stage index + last step time),
    * O(1) state per user regardless of stream length or funnel depth.
    *
    * Emission contract (pinned by FunnelStreamSpec; q102 holds the
    * replay to the batch oracle):
    *  - A COMPLETED funnel emits the moment its final step arrives
    *    ("conversion detected", the real-time use) — the greedy
    *    earliest chain is fixed once complete, so later events can
    *    never revise it and the early emission is final. The key then
    *    holds a completed tombstone: further step events emit nothing.
    *  - `flushType` (the replay sentinel, or an explicit end-of-day
    *    marker) is TERMINAL for the key's current attempt: it emits
    *    the partial progress if nothing was emitted yet, then CLEARS
    *    the key's state (`state.remove()` — flushed keys provably
    *    leave the store). Step events after a flush begin a NEW funnel
    *    attempt with its own emission — a completion that arrives
    *    after its attempt was flushed is counted toward the next
    *    attempt only if the user re-enters at `steps.head`, never
    *    silently merged into the flushed one. Periodic markers
    *    therefore give per-interval funnels, each attempt one row.
    *  - Users who never performed `steps.head` emit nothing, matching
    *    the batch operator. Events with a NULL timestamp or type are
    *    ignored (funnelSorted's filter, mirrored).
    *
    * State lifetime: flushed keys hold no state; mid-funnel and
    * completed keys hold one O(1) entry. For an unbounded production
    * stream without reliable markers, pass `idleTimeout` (e.g.
    * "2 hours"): a key idle that long (processing time) flushes its
    * un-emitted partial and is removed — the opt-in bound that keeps
    * the store O(active users) forever.
    *
    * WARNING — `idleTimeout` pins bounded runs open: with
    * `ProcessingTimeTimeout` registered, Spark's
    * `shouldRunAnotherBatch` is unconditionally true
    * (`FlatMapGroupsWithStateExecBase`, spark-sql 4.1.2), so a
    * `Trigger.AvailableNow`/`Once` query keeps scheduling EMPTY
    * micro-batches until every registered timeout expires —
    * `awaitTermination` on a bounded replay with a 1-hour idleTimeout
    * blocks for the full hour, burning cores on no-op batches. Replay
    * gates, whose sentinels already clear every key, must leave it
    * None (the continuous-production setting is unaffected: such
    * queries never terminate by design). FunnelStreamSpec pins both
    * modes.
    *
    * Same deployment assumption as [[sessionizeStream]]: events arrive
    * time-ordered across micro-batches (each batch is sorted
    * internally); the replay gate feeds one sorted batch. */
  def funnelStream(
      events: Dataset[Event],
      steps: Seq[String],
      flushType: String = "__sentinel",
      idleTimeout: Option[String] = None): Dataset[FunnelResult] = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(!steps.contains(flushType), "flushType cannot be a funnel step")
    import events.sparkSession.implicits._
    val stepArr = steps.toArray
    val fresh = FunnelState(0, 0L, Long.MinValue, emitted = false)
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelResult](
        OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // idle expiry == an implicit flush: surface the partial,
            // then drop the key from the store
            val st = state.get
            state.remove()
            if (st.stage >= 1 && !st.emitted)
              Iterator.single(FunnelResult(userId, st.stage, st.t1Us, None, None))
            else Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.getOrElse(fresh)
            val out = Seq.newBuilder[FunnelResult]
            sorted.foreach { e =>
              if (e.event_type == flushType) {
                if (st.stage >= 1 && !st.emitted)
                  out += FunnelResult(userId, st.stage, st.t1Us, None, None)
                st = fresh // terminal: the attempt is closed; start over
              } else if (st.stage < stepArr.length &&
                  e.event_type == stepArr(st.stage)) {
                val us = micros(e.ts)
                if (st.stage == 0) {
                  st = FunnelState(1, us, us, emitted = false)
                } else if (us > st.lastUs) {
                  st = st.copy(stage = st.stage + 1, lastUs = us)
                  if (st.stage == stepArr.length && !st.emitted) {
                    out += FunnelResult(userId, st.stage, st.t1Us,
                      Some(st.lastUs), Some(st.lastUs - st.t1Us))
                    st = st.copy(emitted = true)
                  }
                }
              }
            }
            if (st == fresh) {
              // nothing in flight (never started, or closed by a
              // flush): leave no state behind
              if (state.exists) state.remove()
            } else {
              state.update(st)
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join: each left event matched to right
    * events of the same user with `r.ts` in `[l.ts, l.ts + maxGap]` —
    * the incremental funnel/attribution join (click -> purchase within
    * the window), twin of the batch [[graft.operators.RangeJoin]].
    *
    * Both sides carry a watermark and the join condition bounds event
    * time in BOTH directions; together those let Spark expire join
    * state older than `watermark + maxGap`, so state is
    * O(events in the horizon), never the whole stream — the constraint
    * that makes a stream-stream join viable on an unbounded feed. An
    * INNER join emits each match as soon as both rows have arrived;
    * no sentinel flush is needed in a replay. */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      maxGap: String = "2 hours",
      watermark: String = "4 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
        s"""l.user_id = r.user_id AND
           |r.ts >= l.ts AND r.ts <= l.ts + interval $maxGap""".stripMargin))
      .select(col("l.user_id").as("user_id"),
        col("l.event_id").as("id_a"), col("r.event_id").as("id_b"))
  }

  /** Stream-stream interval join, LEFT OUTER: every match emits like
    * [[intervalJoinStream]]'s inner join, and a left event whose
    * window `[l.ts, l.ts + maxGap]` expires below the watermark with
    * NO match emits once with a NULL right side — the in-stream
    * "views that never converted" feed, which an inner join can only
    * express as a second batch reconciliation pass. Same state bound:
    * watermark + the two-sided time condition expire join state at
    * `watermark + maxGap`, never the stream.
    *
    * The null-side emission is WATERMARK-DRIVEN: an unmatched left row
    * is only provably unmatched once the watermark passes its window's
    * end, so a replay must drag BOTH sides' watermarks past the data
    * (multipleWatermarkPolicy defaults to min — advancing one side
    * alone advances nothing). [[graft.streaming.StreamGate.replayLeftOuterIntervalJoin]]
    * routes the global sentinel into both inputs for exactly this
    * reason, and AvailableNow keeps running flush batches until the
    * advanced watermark has surfaced every expired row.
    *
    * Output: (user_id, left_type, id_a, id_b NULL on no match,
    * matched). */
  def leftOuterIntervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      maxGap: String = "2 hours",
      watermark: String = "4 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
        s"""l.user_id = r.user_id AND
           |r.ts >= l.ts AND r.ts <= l.ts + interval $maxGap""".stripMargin),
        "leftOuter")
      .select(col("l.user_id").as("user_id"),
        col("l.event_type").as("left_type"),
        col("l.event_id").as("id_a"), col("r.event_id").as("id_b"),
        col("r.event_id").isNotNull.as("matched"))
  }

  /** Stream-static enrichment join: attach dimension attributes to
    * each streaming event. Stream-static joins are STATELESS — no
    * watermark, no join state — because the static side is re-planned
    * on every micro-batch (so a refreshed dimension table is picked up
    * mid-stream). With `broadcastDim = true` (the default) the explicit
    * `broadcast` keeps the unbounded side shuffle-free: the events
    * never move, the (small) dimension ships to them — the join shape
    * that scales on a 100 TB/day feed. For a dimension too big to fit
    * in executor memory, pass `broadcastDim = false` to degrade to a
    * per-micro-batch shuffled hash join instead of an OOM — slower,
    * never fatal. Inner join: events with no dimension row are dropped
    * (use the dim's own completeness checks upstream).
    *
    * `dimCols` maps dimension column -> output alias, so the enriched
    * schema is explicit and stable. */
  def enrichStream(
      events: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String,
      dimCols: Seq[(String, String)],
      broadcastDim: Boolean = true): DataFrame = {
    val e = events.alias("e")
    val d = (if (broadcastDim) broadcast(dim) else dim).alias("d")
    val out = Seq(col(s"e.$streamKey")) ++
      events.columns.filter(_ != streamKey).map(c => col(s"e.$c")) ++
      dimCols.map { case (c, a) => col(s"d.$c").as(a) }
    e.join(d, col(s"e.$streamKey") === col(s"d.$dimKey"), "inner")
      .select(out: _*)
  }

  /** Stream-static EXCLUSION join: drop every streaming event whose
    * key appears in a static known set — ingest-time blocklisting /
    * decontamination against an existing corpus (the anti-join twin of
    * [[enrichStream]]). Stateless like every stream-static join (the
    * static side is re-planned per micro-batch, so a growing known set
    * is picked up mid-stream), and with `broadcastKnown = true` (the
    * default) the unbounded side never shuffles — the distinct key set
    * ships to the events. A known set too big for executor memory
    * degrades via `broadcastKnown = false` to a per-micro-batch
    * shuffled anti join instead of an OOM. The known side is reduced
    * to its DISTINCT key column before the join — the only bytes
    * shipped are the keys themselves. */
  def excludeKnownStream(
      events: DataFrame,
      known: DataFrame,
      streamKey: String,
      knownKey: String,
      broadcastKnown: Boolean = true): DataFrame = {
    val keys = known.select(col(knownKey).as(streamKey)).distinct()
    val k = if (broadcastKnown) broadcast(keys) else keys
    events.join(k, Seq(streamKey), "left_anti")
  }

  /** Drive a streaming frame to a named in-memory table and block until
    * all available input is processed — the local smoke path. */
  def runToMemory(df: DataFrame, name: String,
      outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
