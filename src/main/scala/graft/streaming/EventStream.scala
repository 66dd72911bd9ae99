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
case class SpendEvent(event_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                      user_id: Long, lv: Long)
case class SpendAlert(user_id: Long, event_id: Long, ts_us: Long,
                      cum_micros: Long, alert_level: Long)

/** The spend-alert state machine on Spark 4's `transformWithState`
  * API (StatefulProcessor + named state variables + RocksDB provider)
  * — the modern replacement for `flatMapGroupsWithState`: state is
  * DECLARED (named, encoder-typed, TTL-capable, schema-evolvable)
  * instead of being one opaque blob per key, and timers are
  * first-class. Folds the same law as [[EventStream.spendAlerts]] —
  * quantized-micros running sum, (ts, event_id) fold order, integer
  * threshold-crossing test — so both state APIs verify against the
  * SAME batch oracle.
  *
  * Unlike the flatMapGroupsWithState twin (which folds each batch as
  * it arrives and therefore REQUIRES event-time-ordered batches),
  * this processor is correct under cross-batch disorder up to the
  * watermark: arriving events are only BUFFERED in `pending`
  * (ListState); the fold runs in [[handleExpiredTimer]] over the
  * prefix of pending events with `ts_us < watermark`, in (ts,
  * event_id) order. An event with ts below the watermark can no
  * longer arrive (the pre-processor late filter drops it), so that
  * prefix is final — the fold consumes events in true event-time
  * order no matter how they were batched. Pending state per user is
  * bounded by the watermark horizon (1 h of that user's purchases),
  * never by stream length; `total` is one long.
  *
  * Timer discipline: exactly one pending timer per key, armed at the
  * earliest buffered event's ts rounded UP to ms (never fires before
  * the instant it guards); re-armed from whatever remains buffered.
  */
class SpendProcessor(thresholdMicros: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, SpendEvent, SpendAlert] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState, ListState}

  @transient private var total: ValueState[Long] = _
  @transient private var pending: ListState[SpendEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    pending = getHandle.getListState[SpendEvent]("pending",
      org.apache.spark.sql.Encoders.product[SpendEvent], TTLConfig.NONE)
  }

  /** One timer per key at the earliest buffered ts (ceil µs→ms). */
  private def armTimer(): Unit = {
    getHandle.listTimers().foreach(t =>
      getHandle.deleteTimer(t.asInstanceOf[Long]))
    val it = pending.get()
    var min = Long.MaxValue
    while (it.hasNext) { val e = it.next(); if (e.ts_us < min) min = e.ts_us }
    if (min != Long.MaxValue)
      getHandle.registerTimer((min + 999L) / 1000L)
  }

  override def handleInputRows(user: Long, rows: Iterator[SpendEvent],
                               tv: TimerValues): Iterator[SpendAlert] = {
    val fresh = rows.toArray
    if (fresh.nonEmpty) pending.appendList(fresh)
    armTimer()
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[SpendAlert] = {
    val wmUs = tv.getCurrentWatermarkInMs() * 1000L
    // strict <: an event AT the watermark could still arrive and must
    // sort into the fold, so it stays buffered until wm passes it
    val (ready, still) = pending.get().toSeq.partition(_.ts_us < wmUs)
    val sorted = ready.sortBy(e => (e.ts_us, e.event_id))
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
    pending.clear()
    if (still.nonEmpty) pending.appendList(still.toArray)
    armTimer()
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
  * `session_window` = q50, and this). Boundary law matches q50's
  * `session_window` as MEASURED at the exact-gap boundary (spec-pinned
  * in StreamingSpec): an event landing exactly `gap` after the last
  * one MERGES into the session — the break is strictly `> gap`, the
  * same law as the batch gaps-and-islands twin — and win_end = last
  * event + gap. q50's oracle verifies this operator verbatim.
  *
  * State is the full set of UNFINALIZED sessions per key (a
  * gap-merged interval set, exactly `session_window`'s merging
  * aggregate state), not a single open session, and
  * [[handleInputRows]] emits NOTHING: a session is only emitted from
  * [[handleExpiredTimer]] once the watermark has passed its close
  * (win_end = last + gap) — `session_window`'s append-mode law. This
  * is what makes cross-batch disorder correct: an event arriving in
  * a later micro-batch but within the watermark delay gap-merges
  * into the buffered interval set (possibly bridging two buffered
  * sessions, possibly extending start_us DOWNWARD — both fall out of
  * the interval sweep), while a session whose close the watermark
  * has passed is provably untouchable (any still-admissible event
  * has ts ≥ wm ≥ last + gap, i.e. strictly more than `gap` after the
  * session's last event, so it cannot merge) and is safe to emit.
  * Buffered state per key is bounded by the watermark horizon plus
  * one gap, never by stream length.
  *
  * Timer discipline: exactly ONE pending timer per key, armed at the
  * EARLIEST buffered session's close rounded UP to ms (never fires
  * before the instant it guards — an exact-boundary event in a later
  * batch still finds its session buffered, not flushed); re-armed
  * against whatever remains buffered after each flush.
  */
class SessionProcessor(gapUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, SessEvent, SessRow] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ListState}

  @transient private var open: ListState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getListState[OpenSession]("open",
      org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

  /** Gap-merge sweep: sort by start, union intervals whose gap is ≤
    * the width (touching windows MERGE — the strict `>` break).
    */
  private def merged(xs: Seq[OpenSession]): Seq[OpenSession] = {
    val sorted = xs.sortBy(s => (s.start_us, s.last_us))
    val out = Seq.newBuilder[OpenSession]
    var cur: OpenSession = null
    sorted.foreach { s =>
      if (cur == null) cur = s
      else if (s.start_us - cur.last_us <= gapUs)
        cur = OpenSession(cur.start_us,
          math.max(cur.last_us, s.last_us), cur.n + s.n)
      else { out += cur; cur = s }
    }
    if (cur != null) out += cur
    out.result()
  }

  /** One timer per key at the earliest buffered close (ceil µs→ms). */
  private def armTimer(sessions: Seq[OpenSession]): Unit = {
    getHandle.listTimers().foreach(t =>
      getHandle.deleteTimer(t.asInstanceOf[Long]))
    if (sessions.nonEmpty) {
      val endUs = sessions.map(_.last_us + gapUs).min
      getHandle.registerTimer((endUs + 999L) / 1000L)
    }
  }

  override def handleInputRows(user: Long, rows: Iterator[SessEvent],
                               tv: TimerValues): Iterator[SessRow] = {
    val incoming = rows.map(e => OpenSession(e.ts_us, e.ts_us, 1L)).toSeq
    val all = merged(open.get().toSeq ++ incoming)
    open.clear()
    if (all.nonEmpty) open.appendList(all.toArray)
    armTimer(all)
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[SessRow] = {
    val wmUs = tv.getCurrentWatermarkInMs() * 1000L
    // strict <: an event AT the watermark could still arrive and a
    // session closing exactly there would merge it (touching law), so
    // that session stays buffered until the watermark passes its close
    val (closed, still) = open.get().toSeq
      .partition(s => s.last_us + gapUs < wmUs)
    open.clear()
    if (still.nonEmpty) open.appendList(still.toArray)
    armTimer(still)
    closed.sortBy(_.start_us)
      .map(s => SessRow(s.start_us, s.last_us + gapUs, user, s.n))
      .iterator
  }
}

object EventStream {

  /** Wire schema of STAGED landing files: ts is an epoch-NANOS long —
    * every staging helper normalizes the source to this via
    * [[eventsNanos]], so the streaming readers' `ts div 1000`
    * conversion holds regardless of which precision the testdata
    * generation shipped (ScaleStream's generated landings and
    * StreamingSpec's fixtures write ns longs directly).
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The source events table with ts as epoch-ns LONG — the staging
    * wire format. Generations have shipped ts as TIMESTAMP(NANOS)
    * (reads as a raw long under nanosAsLong) and TIMESTAMP(MICROS)
    * (reads as a timestamp); dispatch on the INFERRED type — pinning a
    * LongType schema over a µs file silently yields raw µs and shifts
    * every event 1000× early (observed when the generator switched).
    */
  private def eventsNanos(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/events.parquet")
    val norm = df.schema("ts").dataType match {
      case LongType => df // nanos generation: already the wire format
      case _: TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      // µs generation infers NTZ (isAdjustedToUTC=false); session TZ is
      // pinned UTC, so the cast relabels the same instant exactly
      case _: TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case t => throw new IllegalArgumentException(
        s"events.ts has unexpected type $t under $dir")
    }
    norm.select(eventsSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

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
      eventsNanos(s, dir)
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
  private val sentinelDirs = scala.collection.concurrent.TrieMap[(String, Long), String]()
  private def stageWithSentinel(s: SparkSession, dir: String): String =
    stageWithSentinelAt(s, dir, horizonHours = 3L)

  /** [[stageWithSentinel]] with a caller-chosen flush horizon: a
    * sentinel only flushes windows whose CLOSE the advanced watermark
    * passes, so an aggregation windowed coarser than the session gap
    * (q138's 1-day second stage) needs the sentinel farther out than
    * the default 3 h — past the last day boundary plus the watermark
    * delay.
    */
  private def stageWithSentinelAt(s: SparkSession, dir: String,
                                  horizonHours: Long): String =
    sentinelDirs.getOrElseUpdate((dir, horizonHours), {
      val staged = Sinks.tmpPath(
        stagedNameFor(s"stream_in_sent_h$horizonHours", dir))
      val base = eventsNanos(s, dir)
      val maxRow = base.agg(max(col("ts"))).head()
      require(!maxRow.isNullAt(0),
        s"events table under $dir is empty — no watermark horizon to " +
          "stage a flush sentinel against")
      val maxNs = maxRow.getLong(0)
      val sentinel = s.range(1).select(
        lit(-1L).as("event_id"),
        lit(maxNs + horizonHours * 3600L * 1000000000L).as("ts"), // +h in ns
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
  def tumblingCounts(s: SparkSession, dir: String): DataFrame =
    runTumblingStream(s, stageOnce(s, dir), s"stream_counts_${dirTag(dir)}",
      maxFilesPerTrigger = None)

  /** The tumblingCounts pipeline over an already-staged landing dir
    * (package-private: ScaleStream drives it at 10⁷-event scale with
    * `maxFilesPerTrigger = Some(1)` so every staged file is its own
    * micro-batch and the watermark genuinely advances between batches —
    * the configuration in which dedup-state eviction is observable).
    */
  private[graft] def runTumblingStream(s: SparkSession, staged: String,
                                       sinkTag: String,
                                       maxFilesPerTrigger: Option[Int]): DataFrame = {
    val sinkDir = Sinks.tmpPath(s"${sinkTag}_sink")
    val ckptDir = Sinks.tmpPath(s"${sinkTag}_ckpt")
    // fresh run: a stale checkpoint would resume past the staged input
    // and emit zero batches; a stale sink would leak old windows
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val reader = s.readStream.schema(eventsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
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
    // state partitions sized to the input, not the core count (see
    // Tuning.streamStatePartitions) — the conf covers start AND
    // awaitTermination (batch 0 plans on the stream thread, after
    // start() returns)
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          Sinks.appendRawZone(batch.withColumn("_batch", lit(batchId)), sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
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
    // state partitions sized to the input, not the core count (see
    // Tuning.streamStatePartitions) — the conf covers start AND
    // awaitTermination (batch 0 plans on the stream thread, after
    // start() returns)
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          Sinks.appendRawZone(batch.withColumn("_batch", lit(batchId)), sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Upsert.latestByKey(s.read.parquet(sinkDir),
        Seq("win_start", "event_type"), col("_batch"))
      .select("win_start", "win_end", "event_type", "n")
  }

  /** Chained (window-on-window) streaming aggregation — hourly per-type
    * counts re-aggregated into DAILY totals inside ONE streaming query,
    * Spark 4's multiple-stateful-operator support (dedup → windowed agg
    * → windowed agg). The second stage groups on
    * `window(window_time(hwin), "1 day")` — the documented chained-agg
    * idiom: `window_time` exposes the hourly window's event-time point
    * (end − 1 µs) so the day window inherits a watermark.
    *
    * Why it matters at 100 TB: the daily rollup consumes hourly
    * PARTIALS (|types| × 24 rows per day), never raw events — map-side-
    * combine discipline applied ACROSS streaming stages. The
    * alternative (a second job re-reading the hourly sink) pays another
    * scan and another scheduler; here the cascade shares one lineage,
    * one checkpoint, one failure domain. State is bounded per stage:
    * open hours + open days per type, each evicted at watermark.
    *
    * Stacked stateful aggs REQUIRE append mode (update is rejected), so
    * rows land in a plain parquet file sink — no changelog/compaction —
    * and each window emits exactly once, when its close passes the
    * watermark. Flushing the final DAY needs the sentinel staged past
    * the last day boundary plus the watermark delay: 50 h covers any
    * last-event phase within its day (≤ 24 h to the boundary + 1 h
    * delay), where tumblingCounts' 3 h default would strand it. As in
    * sessionCounts, the sentinel is NOT filtered before the aggregate —
    * a pre-agg predicate gets pushed below the EventTimeWatermark node
    * and the watermark would never advance; its own hour window (close
    * = sentinel's hour end > final watermark = sentinel − 1 h) is held
    * back naturally, so it never reaches stage 2 or the sink. The
    * read-back filter is defensive.
    */
  def dailyCountsChained(s: SparkSession, dir: String): DataFrame =
    runDailyChainStream(s, stageWithSentinelAt(s, dir, horizonHours = 50L),
      s"stream_daily_${dirTag(dir)}", maxFilesPerTrigger = None)

  /** The chained pipeline over an already-staged landing dir
    * (package-private: ScaleStream drives it at 10⁷-event scale with
    * one file per micro-batch, where the two stages' state bounds —
    * open hours and open days per type — are observable per batch).
    */
  private[graft] def runDailyChainStream(s: SparkSession, staged: String,
                                         sinkTag: String,
                                         maxFilesPerTrigger: Option[Int]): DataFrame = {
    val sinkDir = Sinks.tmpPath(s"${sinkTag}_sink")
    val ckptDir = Sinks.tmpPath(s"${sinkTag}_ckpt")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val reader = s.readStream.schema(eventsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val hourly = reader
      .parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      // watermark-scoped dedup state (see tumblingCounts) — the
      // exactly-once ingestion layer runs below both aggregates
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour").as("hwin"), col("event_type"))
      .agg(count(lit(1)).as("n_hour"))
    val daily = hourly
      .groupBy(window(window_time(col("hwin")), "1 day").as("dwin"),
        col("event_type"))
      .agg(sum(col("n_hour")).as("n"))
      .select(col("dwin.start").as("day_start"), col("event_type"), col("n"))
    // state partitions sized to the input, not the core count
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = daily.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(sinkDir).filter(col("event_type") =!= "flush")
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
    // state partitions sized to the input, not the core count
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
          Sinks.appendRawZone(batch.withColumn("_batch", lit(batchId)), sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
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
    // state partitions sized to the input, not the core count
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          Sinks.appendRawZone(batch, sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
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
      val base = eventsNanos(s, dir)
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
    // state partitions sized to the input, not the core count
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          Sinks.appendRawZone(batch, sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
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
    * HARD PRECONDITION (this API folds each batch on arrival): batches
    * must be event-time-ordered ACROSS batches — an event older than a
    * previously folded batch would fold out of order. The single-file
    * staging guarantees it here; a deployment that cannot guarantee
    * arrival order uses [[spendAlertsTws]] (q107), whose
    * watermark-buffered fold is correct under cross-batch disorder.
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
      .select(col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"),
        expr("ts div 1000").as("ts_us"),
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

    // state partitions sized to the input, not the core count
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = alerts.toDF().writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          Sinks.appendRawZone(batch, sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
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
                     thresholdMicros: Long = 500L * 1000000L): DataFrame =
    runSpendStream(s, stageWithSentinel(s, dir),
      s"stream_tws_${dirTag(dir)}", thresholdMicros,
      maxFilesPerTrigger = None)

  /** The cross-batch-disorder proof for the SPEND fold (q116, the
    * alert twin of q110): [[SpendProcessor]] over the out-of-order
    * multi-file landing dir, one file per micro-batch — held-back
    * purchases arrive up to 30 minutes later than already-folded
    * neighbors, and the watermark-buffered fold must still consume
    * them in true (ts, event_id) order for the alerts to match the
    * arrival-order-blind batch oracle (q85's, shared verbatim).
    */
  def spendAlertsTwsOoo(s: SparkSession, dir: String,
                        thresholdMicros: Long = 500L * 1000000L): DataFrame =
    runSpendStream(s, stageOutOfOrder(s, dir),
      s"stream_tws_ooo_${dirTag(dir)}", thresholdMicros,
      maxFilesPerTrigger = Some(1))

  /** The SpendProcessor pipeline over an already-staged landing dir
    * (same shape as [[runSessionStream]]).
    */
  private[graft] def runSpendStream(s: SparkSession, staged: String,
                                    sinkTag: String, thresholdMicros: Long,
                                    maxFilesPerTrigger: Option[Int]): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    require(thresholdMicros > 0,
      s"thresholdMicros must be > 0, got $thresholdMicros")
    val sinkDir = Sinks.tmpPath(s"${sinkTag}_sink")
    val ckptDir = Sinks.tmpPath(s"${sinkTag}_ckpt")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the event-time-timer fold needs a watermark; the filter MUST
      // let the sentinel (user −1, type "flush") through — a predicate
      // excluding it gets pushed below the EventTimeWatermark node and
      // the final watermark would stall 1 h short of the last real
      // purchases, leaving their alerts buffered forever. The
      // sentinel's lv is 0 and its ts stays above the final watermark,
      // so it never folds and never emits.
      val reader = s.readStream.schema(eventsSchema)
      maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      val typed = reader
        .parquet(staged)
        .filter(col("event_type") === "purchase" || col("user_id") < 0)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
        .select(col("event_id"), col("ts"),
          expr("unix_micros(ts)").as("ts_us"),
          col("user_id"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("lv"))
        .as[SpendEvent]
      val alerts = typed.groupByKey(_.user_id)
        .transformWithState(new SpendProcessor(thresholdMicros),
          TimeMode.EventTime(), OutputMode.Append())
      // state partitions sized to the input, not the core count
      graft.Tuning.withStreamShuffle(s, staged) {
        val q = alerts.toDF().writeStream
          .outputMode("append")
          .option("checkpointLocation", ckptDir)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
            Sinks.appendRawZone(batch, sinkDir)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
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
                       gapMinutes: Int = 30): DataFrame =
    runSessionStream(s, stageWithSentinel(s, dir),
      s"stream_sess_tws_${dirTag(dir)}", gapMinutes, maxFilesPerTrigger = None)

  /** The SessionProcessor pipeline over an already-staged landing dir
    * (package-private to graft: StreamingSpec drives it with hand-built
    * multi-file dirs). `maxFilesPerTrigger = Some(1)` makes each
    * staged file its own micro-batch, the configuration that
    * genuinely exercises the cross-batch merge path.
    */
  private[graft] def runSessionStream(s: SparkSession, staged: String,
                                          sinkTag: String, gapMinutes: Int,
                                          maxFilesPerTrigger: Option[Int]): DataFrame = {
    val sinkDir = Sinks.tmpPath(s"${sinkTag}_sink")
    val ckptDir = Sinks.tmpPath(s"${sinkTag}_ckpt")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    runSessionStreamAt(s, staged, sinkDir, ckptDir, gapMinutes,
      maxFilesPerTrigger)
  }

  /** RESUMABLE core of the SessionProcessor pipeline: caller owns the
    * sink and checkpoint directories and nothing is deleted, so a
    * second invocation with the SAME `ckptDir` after more files landed
    * in `staged` is a genuine restart-from-checkpoint — the file
    * source's committed offsets skip every already-processed file, and
    * the RocksDB state store restores each key's buffered interval set
    * AND its pending event-time timer before the first new batch runs.
    * That is the operational contract a 100 TB deployment leans on
    * (executor loss, driver restart, planned redeploy), and
    * StreamingSpec proves it the only way that counts: a session whose
    * events STRADDLE the restart must come out identical to the
    * uninterrupted run's.
    */
  private[graft] def runSessionStreamAt(s: SparkSession, staged: String,
                                        sinkDir: String, ckptDir: String,
                                        gapMinutes: Int,
                                        maxFilesPerTrigger: Option[Int]): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val reader = s.readStream.schema(eventsSchema)
      maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      val typed = reader
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
      // state partitions sized to the input, not the core count
      graft.Tuning.withStreamShuffle(s, staged) {
        val q = sessions.toDF().writeStream
          .outputMode("append")
          .option("checkpointLocation", ckptDir)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
            Sinks.appendRawZone(batch, sinkDir)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
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

  /** OUT-OF-ORDER landing staging: the history split into three files
    * that arrive in event-time-overlapping order — each boundary holds
    * back the even-event_id events of the 30 minutes before the cut
    * into the NEXT file, so later micro-batches genuinely contain
    * events OLDER than earlier batches' maxima (by up to 30 min, well
    * inside the 1-hour watermark) — plus the flush sentinel as the
    * final file. Modification times are rewritten in staging order
    * with 2-second spacing: the file source orders its batches by
    * mtime, and two parquet commits can otherwise land in the same
    * timestamp granule and swap, which would turn controlled 30-min
    * disorder into >1 h lateness (silent drops).
    */
  private val oooDirs = scala.collection.concurrent.TrieMap[String, String]()
  private def stageOutOfOrder(s: SparkSession, dir: String): String =
    oooDirs.getOrElseUpdate(dir, {
      val staged = Sinks.tmpPath(stagedNameFor("stream_in_ooo", dir))
      val base = eventsNanos(s, dir)
      val mm = base.agg(min(col("ts")), max(col("ts"))).head()
      require(!mm.isNullAt(0),
        s"events table under $dir is empty — nothing to stage")
      val (minNs, maxNs) = (mm.getLong(0), mm.getLong(1))
      val lateNs = 30L * 60L * 1000000000L // held-back slice width
      val cut1 = minNs + (maxNs - minNs) / 3
      val cut2 = minNs + 2L * (maxNs - minNs) / 3
      def held(cut: Long) = // the events deferred past this cut
        col("ts") > cut - lateNs && col("ts") <= cut &&
          col("event_id") % 2 === 0
      val chunks = Seq(
        base.filter(col("ts") <= cut1 && !held(cut1)),
        base.filter((col("ts") > cut1 && col("ts") <= cut2 &&
          !held(cut2)) || held(cut1)),
        base.filter(col("ts") > cut2 || held(cut2)),
        s.range(1).select(
          lit(-1L).as("event_id"),
          lit(maxNs + 3L * 3600L * 1000000000L).as("ts"),
          lit(-1L).as("user_id"), lit("flush").as("event_type"),
          lit(0.0).as("value"), lit(null).cast("string").as("props")))
      val dirFile = new java.io.File(staged)
      def dataFiles(): Set[java.io.File] =
        Option(dirFile.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && f.getName.startsWith("part-")).toSet
      var written = Vector.empty[Set[java.io.File]]
      chunks.zipWithIndex.foreach { case (df, i) =>
        val before = dataFiles()
        df.repartition(1).write
          .mode(if (i == 0) "overwrite" else "append").parquet(staged)
        written :+= (dataFiles() -- before)
      }
      val mtime0 = dataFiles().map(_.lastModified()).max
      written.zipWithIndex.foreach { case (fs, i) =>
        fs.foreach(_.setLastModified(mtime0 + (i + 1) * 2000L))
      }
      staged
    })

  /** The cross-batch-disorder proof query (q110): [[SessionProcessor]]
    * over the out-of-order multi-file landing dir, one file per
    * micro-batch — so ~1/6 of all events arrive in a LATER batch than
    * neighbors up to 30 minutes newer, and session state buffered
    * across batches must absorb them (merging sessions, extending
    * session starts downward) for the result to match the
    * arrival-order-blind batch oracle. Shares q50's oracle verbatim:
    * the session law is arrival-invariant up to the watermark, and
    * this query is the configuration that actually proves it.
    */
  def sessionCountsOoo(s: SparkSession, dir: String,
                       gapMinutes: Int = 30): DataFrame =
    runSessionStream(s, stageOutOfOrder(s, dir),
      s"stream_sess_ooo_${dirTag(dir)}", gapMinutes,
      maxFilesPerTrigger = Some(1))

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
    // state partitions sized to the input, not the core count
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          Sinks.appendRawZone(batch, sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(sinkDir)
  }

  /** Stream-stream LEFT OUTER interval join — the attribution join
    * (q53) keeping UNMATCHED purchases as null-click rows: "which
    * purchases had no preceding click" is the negative-space question
    * the inner join can't answer. Outer stream-stream joins are the
    * harder semantics: a match can emit immediately, but an UNMATCHED
    * left row only becomes provably unmatched once the watermark
    * passes the end of its match interval (no qualifying click can
    * arrive anymore) — Spark holds the row in join state until then
    * and emits it null-extended, state still evicted by the two-sided
    * watermark, O(1 interval of events) forever.
    *
    * The flush sentinel must reach BOTH sides' watermark trackers
    * (`user_id < 0` escape in each filter — the q107 lesson: a
    * predicate excluding it pushes below the EventTimeWatermark node
    * and the final watermark stalls one delay short, holding every
    * trailing unmatched row hostage). The sentinel's self-join row is
    * dropped by the read-back filter.
    */
  def attributionJoinLeft(s: SparkSession, dir: String): DataFrame = {
    val staged = stageWithSentinel(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_attrl_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_attrl_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val ev = s.readStream.schema(eventsSchema).parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val purchases = ev
      .filter(col("event_type") === "purchase" || col("user_id") < 0)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "1 hour")
    val clicks = ev
      .filter(col("event_type") === "click" || col("user_id") < 0)
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_event_id"), col("value").as("click_value"))
      .withWatermark("click_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("""user_id = c_user_id AND
              click_ts BETWEEN ts - INTERVAL 1 HOUR AND ts"""),
      "left_outer")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("click_event_id"), col("click_ts"), col("click_value"))
    // state partitions sized to the input, not the core count
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          Sinks.appendRawZone(batch, sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(sinkDir).filter(col("user_id") >= 0)
  }

  /** Stream-stream FULL OUTER interval join — the last cell of the
    * streaming join matrix (q53 inner, q117 left): matched
    * purchase↔click pairs emit as they meet, an unmatched PURCHASE
    * emits null-extended once the watermark proves no qualifying
    * click can arrive (q117's law), and an unmatched CLICK emits
    * null-extended once the watermark proves no purchase window can
    * still claim it — "which clicks converted, which didn't, and
    * which purchases came from nowhere" in ONE pass. State on both
    * sides is the two-sided-watermark interval, evicted as it
    * passes; the asymmetry of the interval (click ∈ [purchase − 1 h,
    * purchase]) means a click is provably unclaimable only after the
    * watermark passes its ts + 1 h — the engine derives that from
    * the join condition.
    *
    * Sentinel discipline as q117 (reach BOTH watermark trackers via
    * the `user_id < 0` escape); for the read-back filter BOTH side's
    * user columns must be checked — an unmatched row carries nulls on
    * the other side, and the sentinel's own unmatched rows appear
    * once per side.
    */
  def attributionJoinFull(s: SparkSession, dir: String): DataFrame = {
    val staged = stageWithSentinel(s, dir)
    val tag = dirTag(dir) // basename + path hash (sink-collision guard)
    val sinkDir = Sinks.tmpPath(s"stream_attrf_$tag")
    val ckptDir = Sinks.tmpPath(s"stream_attrf_ckpt_$tag")
    Sinks.deleteRecursively(sinkDir)
    Sinks.deleteRecursively(ckptDir)
    val ev = s.readStream.schema(eventsSchema).parquet(staged)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val purchases = ev
      .filter(col("event_type") === "purchase" || col("user_id") < 0)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "1 hour")
    val clicks = ev
      .filter(col("event_type") === "click" || col("user_id") < 0)
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_event_id"), col("value").as("click_value"))
      .withWatermark("click_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("""user_id = c_user_id AND
              click_ts BETWEEN ts - INTERVAL 1 HOUR AND ts"""),
      "full_outer")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("click_event_id"), col("c_user_id"), col("click_ts"),
        col("click_value"))
    // state partitions sized to the input, not the core count
    graft.Tuning.withStreamShuffle(s, staged) {
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          Sinks.appendRawZone(batch, sinkDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(sinkDir)
      .filter(coalesce(col("user_id"), lit(0L)) >= 0 &&
        coalesce(col("c_user_id"), lit(0L)) >= 0)
  }
}
