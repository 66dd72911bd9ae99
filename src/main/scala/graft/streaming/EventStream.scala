package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.sources.Sinks
import graft.transform.Upsert

/** Structured Streaming analogue of the reference's incremental batch
  * loop (SURVEY.md §2.10): the reference re-runs details.py and skips
  * already-loaded symbols (details.py:277–281) with per-symbol commits
  * (details.py:221) — in Spark that is a stream with
  * Trigger.AvailableNow (process everything pending, then stop),
  * exactly-once sink effects, watermarked state, and keyed dedup.
  *
  * Scale: aggregation state is bounded by the watermark (late events
  * beyond 1 hour are dropped, state for closed windows is evicted);
  * dedup state is likewise watermark-scoped; and the SINK is a
  * distributed parquet table fed through foreachBatch — nothing ever
  * materializes on the driver, so the same job runs forever on an
  * unbounded source.
  */
/** Typed rows for the custom-state spend-alert stream (top-level,
  * public: Spark's generated encoder projections instantiate these
  * reflectively and cannot access nested `private` classes). Timestamps
  * ride as epoch MICROS longs through the state function (primitive
  * encoders, exact) and become timestamps only in the final projection.
  */
case class SpendEvent(event_id: Long, ts_us: Long, user_id: Long, lv: Long)
case class SpendAlert(user_id: Long, event_id: Long, ts_us: Long,
                      cum_micros: Long, alert_level: Long)

/** The spend-alert state machine on Spark 4's `transformWithState`
  * API (StatefulProcessor + named state variables + RocksDB provider)
  * — the modern replacement for `flatMapGroupsWithState`: state is
  * DECLARED (named, encoder-typed, TTL-capable, schema-evolvable)
  * instead of being one opaque blob per key, and timers are
  * first-class. Semantics here are IDENTICAL to
  * [[EventStream.spendAlerts]] — same quantized-micros fold, same
  * in-batch (ts, event_id) ordering, same threshold-crossing law — so
  * both state APIs verify against the SAME batch oracle.
  */
class SpendProcessor(thresholdMicros: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, SpendEvent, SpendAlert] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[SpendEvent],
                               tv: TimerValues): Iterator[SpendAlert] = {
    // iterator order is shuffle-read order, NOT event order — sort
    val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var cum = if (total.exists()) total.get() else 0L
    val out = Seq.newBuilder[SpendAlert]
    sorted.foreach { e =>
      val pre = cum
      cum += e.lv
      if (cum / thresholdMicros > pre / thresholdMicros)
        out += SpendAlert(user, e.event_id, e.ts_us, cum,
          cum / thresholdMicros)
    }
    total.update(cum)
    out.result().iterator
  }
}

/** Typed rows for the timer-driven sessionizer (top-level for encoder
  * access, like SpendEvent/SpendAlert). `ts` carries the WATERMARKED
  * timestamp column through to the processor (event-time timers track
  * it); the fold itself runs on exact epoch-micros longs.
  */
case class SessEvent(ts: java.sql.Timestamp, ts_us: Long, user_id: Long)
case class OpenSession(start_us: Long, last_us: Long, n: Long)
case class SessRow(win_start_us: Long, win_end_us: Long, user_id: Long,
                   n_events: Long)

/** Gap sessionization as a `transformWithState` EVENT-TIME-TIMER state
  * machine — the third implementation of the library's session law
  * (batch gaps-and-islands `Sessions.sessionize` = q41, built-in
  * `session_window` = q50, and this): in-batch gaps close sessions in
  * the fold; the TRAILING open session closes when the registered
  * event-time timer fires (watermark passes last_ts + gap) via
  * `handleExpiredTimer` — the first-class timer surface
  * flatMapGroupsWithState never had. Boundary law matches q50's
  * `session_window` as MEASURED at the exact-gap boundary (spec-pinned
  * in StreamingSpec): an event landing exactly `gap` after the last
  * one MERGES into the session — the break is strictly `> gap`, the
  * same law as the batch gaps-and-islands twin — and win_end = last
  * event + gap. q50's oracle verifies this operator verbatim.
  *
  * Timer discipline: exactly ONE pending timer per key (stale timers
  * are deleted before re-registering), so an expiry always refers to
  * the current open session — no stale-fire guard needed.
  */
class SessionProcessor(gapUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, SessEvent, SessRow] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}

  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession]("open",
      org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[SessEvent],
                               tv: TimerValues): Iterator[SessRow] = {
    val sorted = rows.toSeq.sortBy(_.ts_us)
    var cur = if (open.exists()) Option(open.get()) else None
    val out = Seq.newBuilder[SessRow]
    sorted.foreach { e =>
      cur match {
        case Some(s0) if e.ts_us - s0.last_us <= gapUs =>
          cur = Some(OpenSession(s0.start_us,
            math.max(s0.last_us, e.ts_us), s0.n + 1))
        case Some(s0) => // gap > gapUs: session_window's break law
          out += SessRow(s0.start_us, s0.last_us + gapUs, user, s0.n)
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1L))
        case None =>
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1L))
      }
    }
    cur.foreach { s0 =>
      open.update(s0)
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer((s0.last_us + gapUs) / 1000L) // us -> ms
    }
    out.result().iterator
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[SessRow] =
    if (open.exists()) {
      val s0 = open.get()
      open.clear()
      Iterator.single(SessRow(s0.start_us, s0.last_us + gapUs, user, s0.n))
    } else Iterator.empty
}

object EventStream {

  /** Same physical schema as Tables.events (TIMESTAMP(NANOS) parquet
    * read as long under spark.sql.legacy.parquet.nanosAsLong).
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The file-stream source consumes a DIRECTORY of arriving files (the
    * shape a real deployment has anyway: a landing dir the fetcher
    * appends to). Stage the single testdata parquet into one — ONCE per
    * JVM per input dir, not once per query invocation.
    */
  /** Staged-dir name: basename for readability plus a hash of the FULL
    * input path — two input dirs sharing a basename (…/a/sf0.01 and
    * …/b/sf0.01) must never stage over each other while the first
    * caller's memo still points at the clobbered files.
    */
  private def dirTag(dir: String): String = {
    val full = new java.io.File(dir).getAbsolutePath
    f"${new java.io.File(dir).getName}_${full.hashCode}%08x"
  }
  private def stagedNameFor(prefix: String, dir: String): String =
    s"${prefix}_${dirTag(dir)}"

  private val stagedDirs = scala.collection.concurrent.TrieMap[String, String]()
  private def stageOnce(s: SparkSession, dir: String): String =
    stagedDirs.getOrElseUpdate(dir, {
      val staged = Sinks.tmpPath(stagedNameFor("stream_in", dir))
      s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
        .write.mode("overwrite").parquet(staged)
      staged
    })

  /** Staged input plus one SENTINEL row (user_id −1) timestamped far
    * past the last real event: on a finite source it advances the
    * watermark beyond every real session's close, so APPEND mode emits
    * even the trailing sessions — the batch-replay analogue of the
    * heartbeat/punctuation event a production event bus carries for
    * exactly this purpose. (The sentinel's own never-closing session is
    * the only row the watermark holds back.)
    */
  private val sentinelDirs = scala.collection.concurrent.TrieMap[String, String]()
  private def stageWithSentinel(s: SparkSession, dir: String): String =
    sentinelDirs.getOrElseUpdate(dir, {
      val staged = Sinks.tmpPath(stagedNameFor("stream_in_sent", dir))
      val base = s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
      val maxRow = base.agg(max(col("ts"))).head()
      require(!maxRow.isNullAt(0),
        s"events table under $dir is empty — no watermark horizon to " +
          "stage a flush sentinel against")
      val maxNs = maxRow.getLong(0)
      val sentinel = s.range(1).select(
        lit(-1L).as("event_id"),
        lit(maxNs + 3L * 3600L * 1000000000L).as("ts"), // +3 h in ns
        lit(-1L).as("user_id"), lit("flush").as("event_type"),
        lit(0.0).as("value"), lit(null).cast("string").as("props"))
      // The file source processes files oldest-first and a watermark only
      // tolerates intra-delay disorder, so the landing files must arrive
      // in rough event-time order (the property a real landing dir has).
      // Stage the history as ONE file — a micro-batch never splits a
      // file, so no event can be >1 h late relative to an earlier batch
      // — then the sentinel as a second, newer file.
      base.repartition(1).write.mode("overwrite").parquet(staged)
      sentinel.write.mode("append").parquet(staged)
      staged
    })

  /** Tumbling 1-hour event counts per type, computed as a STREAM:
    * readStream → watermark → keyed dedup → windowed aggregate →
    * UPDATE-mode foreachBatch that appends each batch's changed windows
    * (stamped with the batch id) to a parquet changelog through the
    * raw-zone sink → run to completion → compact the changelog with the
    * library's last-write-wins kernel (latest batch wins per window).
    *
    * This is the reference's per-symbol-commit upsert re-expressed for
    * streams: every micro-batch is an atomic parquet append (commit),
    * and the keyed upsert happens on read via Upsert.latestByKey — a
    * changelog + compaction instead of an in-place rewrite, so a batch
    * commit costs O(batch), never O(table). The final result is read
    * from the table, NOT from driver memory: update mode also means the
    * trailing window (which a watermark would hold back in append mode
    * on a finite source) is emitted with its final count.
    */
  def tumblingCounts(s: SparkSession, dir: String): DataFrame = {
    val staged = stageOnce(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_counts_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_ckpt_$tag")
    // fresh run: a stale checkpoint would resume past the staged input
    // and emit zero batches; a stale sink would leak old windows
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val stream = s.readStream.schema(eventsSchema)
      .parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      // streaming keyed dedup (exactly-once per event_id within the
      // watermark horizon) — the stream analogue of the raw-zone
      // skip-existing anti-join. MUST be the WithinWatermark variant:
      // plain dropDuplicates on a key set that excludes the event-time
      // column never evicts its state by watermark, so dedup state
      // grows without bound on an unbounded source.
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("event_type"), col("n"))
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        Sinks.appendRawZone(batch.withColumn("_batch", lit(batchId)), sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Upsert.latestByKey(s.read.parquet(sinkDir),
        Seq("win_start", "event_type"), col("_batch"))
      .select("win_start", "win_end", "event_type", "n")
  }

  /** Sliding (hopping) 2-hour windows on a 1-hour slide — the one
    * built-in streaming window kind tumbling/session don't cover: each
    * event lands in duration/slide = 2 overlapping windows, the shape
    * behind "rolling 2-hour rate" alerting. Same changelog-commit
    * contract as tumblingCounts (update-mode foreachBatch appends,
    * last-write-wins compaction on read, nothing on the driver); state
    * is 2× the tumbling case per key — still watermark-bounded, evicted
    * as windows close.
    */
  def slidingCounts(s: SparkSession, dir: String): DataFrame = {
    val staged = stageOnce(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_slide_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_slide_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val stream = s.readStream.schema(eventsSchema)
      .parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      // watermark-scoped dedup state (see tumblingCounts) — plain
      // dropDuplicates("event_id") would never evict state
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("event_type"), col("n"))
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        Sinks.appendRawZone(batch.withColumn("_batch", lit(batchId)), sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Upsert.latestByKey(s.read.parquet(sinkDir),
        Seq("win_start", "event_type"), col("_batch"))
      .select("win_start", "win_end", "event_type", "n")
  }

  /** Stream–STATIC dimension enrichment — the remaining join shape of
    * the streaming surface (stream-stream interval join is q53): each
    * micro-batch equi-joins against a STATIC batch-computed dimension
    * (here: each user's cohort week, the q83 law), Spark broadcasts
    * the dimension into every batch, and the enriched stream
    * aggregates per (cohort_week, event_type). No watermark is needed
    * on the static side (it is immutable by contract); keyed dedup
    * keeps ingestion exactly-once; the keyed aggregate state is
    * bounded by |cohorts|×|types|, not by the stream. Same update-mode
    * changelog + last-write-wins compaction commit contract as
    * tumblingCounts.
    */
  def enrichedCounts(s: SparkSession, dir: String): DataFrame = {
    val staged = stageOnce(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_enrich_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_enrich_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    // static dimension: batch read of the same landing dir (the
    // deployment shape: a periodically-rebuilt dim table the stream
    // enriches against)
    val cohorts = s.read.schema(eventsSchema).parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val stream = s.readStream.schema(eventsSchema)
      .parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      // watermark-scoped dedup state (see tumblingCounts) — plain
      // dropDuplicates("event_id") would never evict state
      .dropDuplicatesWithinWatermark("event_id")
      .join(broadcast(cohorts), "user_id") // stream-static equi-join
      .groupBy(col("cohort_week"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        Sinks.appendRawZone(batch.withColumn("_batch", lit(batchId)), sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Upsert.latestByKey(s.read.parquet(sinkDir),
        Seq("cohort_week", "event_type"), col("_batch"))
      .select("cohort_week", "event_type", "n")
  }

  /** Streaming sessionization: `session_window` (gap-merged session
    * state, the built-in replacement for hand-rolled
    * flatMapGroupsWithState sessionizers) over the watermarked event
    * stream, in APPEND mode — a session row is emitted exactly once,
    * when the watermark passes its close, so the sink is a plain
    * append table needing NO compaction (unlike the update-mode
    * changelog of tumblingCounts: finalized sessions are immutable).
    * The trailing-session flush comes from the staged sentinel event
    * (see stageWithSentinel); the sentinel's own session is the one
    * row never finalized, and its user_id −1 is filtered out anyway.
    *
    * Semantics note: session_window MERGES an event landing exactly
    * `gap` after the previous one — windows that touch are unioned, so
    * the break is strictly `> gap`, the SAME law as the batch
    * gaps-and-islands twin (measured at the boundary and pinned in
    * StreamingSpec via the q109 differential; an earlier version of
    * this comment claimed a `>=` break, which no testdata gap ever
    * exercised). The oracle encodes the strict break.
    */
  def sessionCounts(s: SparkSession, dir: String,
                    gapMinutes: Int = 30): DataFrame = {
    val staged = stageWithSentinel(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_sessions_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_sess_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val stream = s.readStream.schema(eventsSchema)
      .parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      // NO pre-aggregation filter on the sentinel: a non-ts predicate
      // here gets pushed below the EventTimeWatermark node by the
      // optimizer, and the sentinel would never reach the watermark
      // tracker (observed: the last watermark-delay's worth of sessions
      // stayed unflushed). The sentinel's own session is instead held
      // back naturally — its close is past the final watermark — so it
      // never reaches the sink; the read-back filter below is defensive.
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("win"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("user_id"), col("n_events"))
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        Sinks.appendRawZone(batch, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(sinkDir).filter(col("user_id") >= 0)
  }

  /** Duplicated landing dir for the streaming-dedup query: the history
    * twice in one file (in-batch duplicates) plus the history again as a
    * second file (cross-batch duplicates against carried state). Staged
    * once per JVM per input dir.
    */
  private val dupDirs = scala.collection.concurrent.TrieMap[String, String]()
  private def stageDuplicated(s: SparkSession, dir: String): String =
    dupDirs.getOrElseUpdate(dir, {
      val staged = Sinks.tmpPath(stagedNameFor("stream_in_dup", dir))
      val base = s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
      base.union(base).repartition(1).write.mode("overwrite").parquet(staged)
      base.repartition(1).write.mode("append").parquet(staged)
      staged
    })

  /** Streaming exactly-once dedup — `dropDuplicatesWithinWatermark` over
    * a landing dir that delivers every event THREE times (twice inside
    * one batch, once more in a later batch), emitting each event exactly
    * once. This is the ingestion-dedup guarantee an at-least-once
    * delivery bus needs and the stream twin of the batch exact-dedup
    * (q22) / skip-existing anti-join (J1): the batch forms dedup against
    * a table, the stream dedups against WATERMARK-BOUNDED KEY STATE —
    * state for an event id is dropped once the watermark passes its
    * event time + delay, so state stays O(1 watermark-window of keys)
    * forever on an unbounded source (a plain `dropDuplicates` would
    * grow state without bound — the 100 TB mistake this operator
    * exists to avoid).
    *
    * maxFilesPerTrigger=1 forces the second delivery into its own
    * micro-batch so the CROSS-batch path (state lookup, not in-batch
    * shuffle dedup) is genuinely exercised. Append mode emits first
    * occurrences immediately (dedup gates duplicates, not time), so no
    * flush sentinel is needed.
    */
  def dedupedEvents(s: SparkSession, dir: String): DataFrame = {
    val staged = stageDuplicated(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_dedup_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_dedup_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val stream = s.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        Sinks.appendRawZone(batch, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(sinkDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Custom keyed state via `flatMapGroupsWithState` — the one
    * Structured Streaming surface the BUILT-IN operators genuinely
    * cannot express: per-user cumulative purchase spend with an alert
    * row emitted each time the running total crosses a threshold
    * multiple. A windowed aggregate can't do it (the emission condition
    * depends on the exact fold path of the total, not on a window's
    * value), and `session_window`/dedup state machines don't carry
    * user-defined state. This is the library's demonstration that when
    * the built-ins run out, the typed state API is the next step —
    * NOT a driver-side loop.
    *
    * Determinism: spend is quantized to micro-units on ingest
    * (`round(value·10⁶)` as long), the per-group batch iterator is
    * sorted by (event time, event id) before folding — the iterator's
    * own order is shuffle-read order, NOT event order — and the
    * threshold crossing test is pure long arithmetic, so the emitted
    * rows match a batch engine's ordered cumulative sum exactly.
    *
    * State per user is ONE long (the running total) — bounded by key
    * cardinality, not stream length. NoTimeout keeps lifetime-total
    * semantics (the oracle's); a deployment that wants
    * inactivity-scoped totals flips to EventTimeTimeout and resets on
    * expiry — the state plumbing is identical.
    */
  def spendAlerts(s: SparkSession, dir: String,
                  thresholdMicros: Long = 500L * 1000000L): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(thresholdMicros > 0,
      s"thresholdMicros must be > 0, got $thresholdMicros")
    val staged = stageWithSentinel(s, dir) // single-file history: one batch
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_alerts_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_alerts_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)

    val typed = s.readStream.schema(eventsSchema)
      .parquet(staged)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("lv"))
      .as[SpendEvent]

    val alerts = typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, SpendAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SpendEvent], state: GroupState[Long]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var cum = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[SpendAlert]
          sorted.foreach { e =>
            val pre = cum
            cum += e.lv
            if (cum / thresholdMicros > pre / thresholdMicros)
              out += SpendAlert(user, e.event_id, e.ts_us, cum,
                cum / thresholdMicros)
          }
          state.update(cum)
          out.result().iterator
      }

    val q = alerts.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        Sinks.appendRawZone(batch, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(sinkDir)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"),
        col("cum_micros"), col("alert_level"))
  }

  /** [[SpendProcessor]] driven end-to-end: same staged input, sink and
    * read-back contract as [[spendAlerts]], but through
    * `transformWithState` + the RocksDB state store (the API requires
    * it; the provider conf is restored afterwards). At 100 TB the
    * RocksDB store is also the OPERATIONAL answer — state spills to
    * local disk with changelog checkpointing instead of living on the
    * executor heap.
    */
  def spendAlertsTws(s: SparkSession, dir: String,
                     thresholdMicros: Long = 500L * 1000000L): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    require(thresholdMicros > 0,
      s"thresholdMicros must be > 0, got $thresholdMicros")
    val staged = stageWithSentinel(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_tws_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_tws_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val typed = s.readStream.schema(eventsSchema)
        .parquet(staged)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), expr("ts div 1000").as("ts_us"),
          col("user_id"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("lv"))
        .as[SpendEvent]
      val alerts = typed.groupByKey(_.user_id)
        .transformWithState(new SpendProcessor(thresholdMicros),
          TimeMode.None(), OutputMode.Append())
      val q = alerts.toDF().writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          Sinks.appendRawZone(batch, sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => s.conf.set(providerKey, v)
      case None    => s.conf.unset(providerKey)
    }
    s.read.parquet(sinkDir)
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"),
        col("cum_micros"), col("alert_level"))
  }

  /** [[SessionProcessor]] driven end-to-end: watermarked stream →
    * groupByKey(user) → transformWithState in EventTime mode (timers
    * need the watermark) → append-mode parquet sink. The sentinel
    * advances the final watermark past every real session's close, so
    * the trailing sessions flush through their timers; the sentinel's
    * own session never fires (its timer sits past the last watermark)
    * and the read-back filter drops user −1 defensively — the exact
    * q50 contract, shared oracle included.
    */
  def sessionCountsTws(s: SparkSession, dir: String,
                       gapMinutes: Int = 30): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val staged = stageWithSentinel(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_sess_tws_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_sess_tws_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val typed = s.readStream.schema(eventsSchema)
        .parquet(staged)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("user_id"))
        .as[SessEvent]
      val sessions = typed.groupByKey(_.user_id)
        .transformWithState(
          new SessionProcessor(gapMinutes.toLong * 60L * 1000000L),
          TimeMode.EventTime(), OutputMode.Append())
      val q = sessions.toDF().writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          Sinks.appendRawZone(batch, sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => s.conf.set(providerKey, v)
      case None    => s.conf.unset(providerKey)
    }
    s.read.parquet(sinkDir)
      .filter(col("user_id") >= 0)
      .select(timestamp_micros(col("win_start_us")).as("win_start"),
        timestamp_micros(col("win_end_us")).as("win_end"),
        col("user_id"), col("n_events"))
  }

  /** Stream-stream interval join — purchases ⋈ clicks of the same user
    * within the preceding hour (the attribution join as a STREAM). Both
    * sides are watermarked so the join's buffered state is evicted once
    * the watermark passes the interval: state stays O(1 hour of
    * events) forever, the defining property of a watermarked
    * stream-stream join. INNER join semantics: matches emit as soon as
    * both rows have arrived — no watermark gating of output (the
    * watermark only bounds state and late drops), so no sentinel is
    * needed; staging still uses the single-file layout so a multi-file
    * batch split cannot make one side "late" relative to the other.
    */
  def attributionJoin(s: SparkSession, dir: String): DataFrame = {
    val staged = stageWithSentinel(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_attr_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_attr_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val ev = s.readStream.schema(eventsSchema).parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "1 hour")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_event_id"), col("value").as("click_value"))
      .withWatermark("click_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("""user_id = c_user_id AND
              click_ts BETWEEN ts - INTERVAL 1 HOUR AND ts"""))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("click_event_id"), col("click_ts"), col("click_value"))
    val q = joined.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        Sinks.appendRawZone(batch, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(sinkDir)
  }
}
