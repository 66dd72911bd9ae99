package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Micro-scale streaming tests: a hand-built landing dir (events.parquet
  * with raw long-ns timestamps, like the driver testdata) drives the
  * session_window append+sentinel pipeline and the stream-stream
  * interval join against hand-computed expectations.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // 1 hour in ns
  private def t0 = 1700000000L * 1000000000L // stable epoch base

  /** (event_id, ts_ns, user_id, event_type, value) → a landing dir. */
  private def landingDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("graft_stream_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit(null).cast("string"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("sessionCounts: two sessions split by the 30-min gap; trailing session flushed") {
    // user 1: events at +0, +10 min (one session), +50 min (second —
    // the TRAILING session, only emitted via the sentinel flush);
    // user 2: one event
    val dir = landingDir(Seq(
      (1L, t0, 1L, "view", 1.0),
      (2L, t0 + 10L * 60 * 1000000000L, 1L, "view", 1.0),
      (3L, t0 + 50L * 60 * 1000000000L, 1L, "view", 1.0),
      (4L, t0, 2L, "view", 1.0)))
    val got = EventStream.sessionCounts(spark, dir)
      .select(col("user_id"), col("n_events"),
        unix_micros(col("win_start")).as("s"), unix_micros(col("win_end")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val us0 = t0 / 1000
    val gap = 30L * 60 * 1000000L
    assert(got === Set(
      (1L, 2L, us0, us0 + 10L * 60 * 1000000L + gap),
      (1L, 1L, us0 + 50L * 60 * 1000000L, us0 + 50L * 60 * 1000000L + gap),
      (2L, 1L, us0, us0 + gap)))
  }

  test("attributionJoin: only clicks within the preceding hour match") {
    val dir = landingDir(Seq(
      (1L, t0, 1L, "click", 1.0),             // 90 min before purchase — out
      (2L, t0 + H / 2, 1L, "click", 2.0),     // 60 min before — boundary, in
      (3L, t0 + H, 1L, "click", 3.0),         // 30 min before — in
      (4L, t0 + H + H / 2, 1L, "purchase", 9.0),
      (5L, t0, 2L, "purchase", 9.0)))         // user 2: no clicks
    val got = EventStream.attributionJoin(spark, dir)
      .select(col("event_id"), col("click_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((4L, 2L), (4L, 3L)))
  }

  test("spendAlerts: threshold crossings from folded custom state") {
    val m = 60L * 1000000000L // 1 min in ns
    val dir = landingDir(Seq(
      // user 1: 200 + 200 + 200 → crosses 500 at event 3 (cum 600);
      // then 450 → crosses 1000 at event 4 (cum 1050)
      (1L, t0, 1L, "purchase", 200.0),
      (2L, t0 + m, 1L, "purchase", 200.0),
      (3L, t0 + 2 * m, 1L, "purchase", 200.0),
      (4L, t0 + 3 * m, 1L, "purchase", 450.0),
      // interleaved non-purchase noise must not count
      (5L, t0 + 90L * 1000000000L, 1L, "view", 9999.0),
      // user 2: stays under the threshold — no alert
      (6L, t0, 2L, "purchase", 499.99),
      // user 3: one event crossing TWO levels → single alert, level 2
      (7L, t0, 3L, "purchase", 1200.0)))
    val got = EventStream.spendAlerts(spark, dir)
      .select(col("user_id"), col("event_id"), col("cum_micros"),
        col("alert_level"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set(
      (1L, 3L, 600000000L, 1L),
      (1L, 4L, 1050000000L, 2L),
      (3L, 7L, 1200000000L, 2L)))
  }

  test("sessionCountsTws: timer-flushed sessions equal session_window's") {
    // user 1: +0, +10 min (one session) then +50 min (trailing session
    // — flushed only by its TIMER once the sentinel moves the
    // watermark); user 2: one event; boundary: user 3 at +0 and
    // +30 min EXACTLY — touching windows MERGE (strict > break), so
    // ONE session of 2 events ending at +60 min
    val t0 = 1700000000L * 1000000000L
    val m = 60L * 1000000000L
    val dir = landingDir(Seq(
      (1L, t0, 1L, "view", 1.0),
      (2L, t0 + 10 * m, 1L, "view", 1.0),
      (3L, t0 + 50 * m, 1L, "view", 1.0),
      (4L, t0, 2L, "view", 1.0),
      (5L, t0, 3L, "view", 1.0),
      (6L, t0 + 30 * m, 3L, "view", 1.0)))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("n_events"), col("win_start"),
        col("win_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getTimestamp(3).getTime)).toSet
    val tws = rows(EventStream.sessionCountsTws(spark, dir))
    assert(tws.size == 4) // u1: 2 sessions, u2: 1, u3: 1 (merged)
    assert(tws.contains((3L, 2L, 1700000000000L,
      1700000000000L + 60L * 60000L))) // the boundary merge, explicit
    assert(tws === rows(EventStream.sessionCounts(spark, dir)))
  }

  /** Multi-file landing dir with CONTROLLED arrival order: each inner
    * Seq becomes one parquet file, and modification times are
    * rewritten in sequence (2 s apart) so the file source batches them
    * in exactly this order under maxFilesPerTrigger=1.
    */
  private def stagedMultiFileDir(
      files: Seq[Seq[(Long, Long, Long, String, Double)]]): String = {
    val staged = Files.createTempDirectory("graft_stream_ooo_spec").toString
    val d = new java.io.File(staged)
    def parts(): Set[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && f.getName.startsWith("part-")).toSet
    var written = Vector.empty[Set[java.io.File]]
    files.zipWithIndex.foreach { case (rows, i) =>
      val before = parts()
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit(null).cast("string"))
        .coalesce(1).write
        .mode(if (i == 0) "overwrite" else "append").parquet(staged)
      written :+= (parts() -- before)
    }
    val base = parts().map(_.lastModified()).max
    written.zipWithIndex.foreach { case (fs, i) =>
      fs.foreach(_.setLastModified(base + (i + 1) * 2000L))
    }
    staged
  }

  test("SessionProcessor: cross-batch late events obey the batch session law") {
    // The round-9 advisory scenario: events arriving in a LATER
    // micro-batch but within the 1-h watermark. Batch 2 carries
    //  - user 1 at +45 min: later than user 1's open [0,0] session by
    //    45 min (> gap) and EARLIER than its open [100,100] session by
    //    55 min — must become its OWN session (the old fold merged it
    //    into [100,100] because 45−100 ≤ gap trivially);
    //  - user 2 at +50 min: exactly gap after its +20 min event —
    //    touching windows MERGE across batches;
    //  - user 3 at +70 min: bridges the buffered [40,40] and [100,100]
    //    sessions (30 min to each side) into ONE session.
    // Global watermark after batch 1 is +100 min − 1 h = +40 min, so
    // every batch-2 event is admissible (≥ 40 min).
    val m = 60L * 1000000000L
    val staged = stagedMultiFileDir(Seq(
      Seq((1L, t0, 1L, "view", 1.0),
        (2L, t0 + 100 * m, 1L, "view", 1.0),
        (3L, t0 + 20 * m, 2L, "view", 1.0),
        (4L, t0 + 40 * m, 3L, "view", 1.0),
        (5L, t0 + 100 * m, 3L, "view", 1.0)),
      Seq((6L, t0 + 45 * m, 1L, "view", 1.0),
        (7L, t0 + 50 * m, 2L, "view", 1.0),
        (8L, t0 + 70 * m, 3L, "view", 1.0)),
      Seq((9L, t0 + 280 * m, -1L, "flush", 0.0)))) // sentinel
    val got = EventStream.runSessionStream(spark, staged,
        "spec_sess_ooo", 30, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("n_events"),
        unix_micros(col("win_start")).as("s"), unix_micros(col("win_end")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val us0 = t0 / 1000
    val mu = 60L * 1000000L
    assert(got === Set(
      (1L, 1L, us0, us0 + 30 * mu),
      (1L, 1L, us0 + 45 * mu, us0 + 75 * mu),
      (1L, 1L, us0 + 100 * mu, us0 + 130 * mu),
      (2L, 2L, us0 + 20 * mu, us0 + 80 * mu),
      (3L, 3L, us0 + 40 * mu, us0 + 130 * mu)))
  }

  /** Append one more landing file to an already-staged dir, its mtime
    * strictly after every existing file's (the file source orders
    * batches by mtime; two commits inside one timestamp granule can
    * swap).
    */
  private def appendLandingFile(staged: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    val d = new java.io.File(staged)
    def parts(): Set[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && f.getName.startsWith("part-")).toSet
    val before = parts()
    val base = (before.map(_.lastModified()) + System.currentTimeMillis()).max
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit(null).cast("string"))
      .coalesce(1).write.mode("append").parquet(staged)
    (parts() -- before).foreach(_.setLastModified(base + 2000L))
  }

  test("SessionProcessor: buffered sessions and timers survive a checkpoint restart") {
    // THE restart-from-checkpoint proof (round-10 verdict task 3): run
    // the stream over file 1 only, let AvailableNow terminate (nothing
    // emitted — every session still buffered in RocksDB), then land
    // file 2 + the sentinel and START A NEW QUERY on the same
    // checkpoint. The restarted query must restore each user's
    // buffered interval set and pending timer:
    //  - user 1's file-2 event at +20 min gap-merges into the RESTORED
    //    [0,+10] session → ONE session of 3 events spanning the
    //    restart (state lost ⇒ two sessions, or one of 1 event);
    //  - user 2's +45 min event is > gap after its restored +5 min
    //    session → stays its own session, and the OLD session flushes
    //    through the restored/re-armed timer path.
    val m = 60L * 1000000000L
    val staged = stagedMultiFileDir(Seq(Seq(
      (1L, t0, 1L, "view", 1.0),
      (2L, t0 + 10 * m, 1L, "view", 1.0),
      (3L, t0 + 5 * m, 2L, "view", 1.0))))
    val sinkDir = graft.sources.Sinks.tmpPath("spec_sess_restart_sink")
    val ckptDir = graft.sources.Sinks.tmpPath("spec_sess_restart_ckpt")
    graft.sources.Sinks.deleteRecursively(sinkDir)
    graft.sources.Sinks.deleteRecursively(ckptDir)
    val interim = EventStream.runSessionStreamAt(spark, staged, sinkDir,
      ckptDir, 30, maxFilesPerTrigger = Some(1))
    assert(interim.count() === 0L) // all sessions still open at the stop
    appendLandingFile(staged, Seq(
      (4L, t0 + 20 * m, 1L, "view", 1.0),
      (5L, t0 + 45 * m, 2L, "view", 1.0)))
    appendLandingFile(staged, Seq(
      (9L, t0 + 280 * m, -1L, "flush", 0.0))) // sentinel
    def rowSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("n_events"),
        unix_micros(col("win_start")).as("s"), unix_micros(col("win_end")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val resumed = rowSet(EventStream.runSessionStreamAt(spark, staged,
      sinkDir, ckptDir, 30, maxFilesPerTrigger = Some(1)))
    val us0 = t0 / 1000
    val mu = 60L * 1000000L
    assert(resumed === Set(
      (1L, 3L, us0, us0 + 50 * mu),
      (2L, 1L, us0 + 5 * mu, us0 + 35 * mu),
      (2L, 1L, us0 + 45 * mu, us0 + 75 * mu)))
    // and the interrupted run equals the uninterrupted one, row for row
    val control = rowSet(EventStream.runSessionStream(spark, staged,
      "spec_sess_restart_ctl", 30, maxFilesPerTrigger = Some(1)))
    assert(resumed === control)
  }

  test("sessionCountsOoo: out-of-order arrival equals session_window's sessions") {
    // ~200 events over ~19 h per user with gaps of 1–45 min (so real
    // session breaks occur); stageOutOfOrder defers even-id events at
    // two cut boundaries into later batches. The session law is
    // arrival-invariant up to the watermark, so the timer-driven
    // processor under disorder must equal session_window over the
    // orderly single-file staging, row for row.
    val rows = (1L to 4L).flatMap { u =>
      var t = t0 + u * 60L * 1000000000L
      (0 until 50).map { i =>
        t += (((i * 7 + u * 13) % 45) + 1) * 60L * 1000000000L
        (u * 1000L + i, t, u, "view", 1.0)
      }
    }
    val dir = landingDir(rows)
    def rowSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("n_events"),
        unix_micros(col("win_start")), unix_micros(col("win_end")))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val ooo = rowSet(EventStream.sessionCountsOoo(spark, dir))
    val sw = rowSet(EventStream.sessionCounts(spark, dir))
    assert(ooo.nonEmpty)
    assert(ooo === sw)
  }

  test("SpendProcessor: a cross-batch late purchase folds in event-time order") {
    // file 1: user 1 spends 300 at +0 and 300 at +100 min; file 2
    // delivers a LATE 250 at +45 min (admissible: watermark after
    // batch 1 is +40 min). True ts-order cumulative: 300, 550, 850 —
    // the $500 crossing belongs to the +45 min event (cum 550). An
    // arrival-order fold would misattribute it to the +100 min event
    // (cum 600) and then absorb the late 250 silently.
    val m = 60L * 1000000000L
    val staged = stagedMultiFileDir(Seq(
      Seq((1L, t0, 1L, "purchase", 300.0),
        (2L, t0 + 100 * m, 1L, "purchase", 300.0)),
      Seq((3L, t0 + 45 * m, 1L, "purchase", 250.0)),
      Seq((9L, t0 + 280 * m, -1L, "flush", 0.0)))) // sentinel
    val got = EventStream.runSpendStream(spark, staged,
        "spec_spend_ooo", 500L * 1000000L, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("event_id"), col("cum_micros"),
        col("alert_level"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set((1L, 3L, 550000000L, 1L)))
  }

  test("attributionJoinLeft: unmatched purchases emit null-extended") {
    val dir = landingDir(Seq(
      (1L, t0, 1L, "click", 1.0),             // 30 min before purchase — in
      (2L, t0 + H / 2, 1L, "purchase", 9.0),
      (3L, t0, 2L, "purchase", 7.0)))         // user 2: no clicks at all
    val got = EventStream.attributionJoinLeft(spark, dir)
      .select(col("event_id"), col("click_event_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got === Set((2L, 1L), (3L, -1L)))
  }

  test("spendAlertsTws: transformWithState emits the identical alert set") {
    // the differential contract behind q85/q107 sharing one oracle:
    // both arbitrary-state APIs fold the same law to the same rows
    val t0 = 1700000000L * 1000000000L
    val m = 60L * 1000000000L
    val dir = landingDir(Seq(
      (1L, t0, 1L, "purchase", 200.0),
      (2L, t0 + m, 1L, "purchase", 200.0),
      (3L, t0 + 2 * m, 1L, "purchase", 200.0),
      (4L, t0 + 3 * m, 1L, "purchase", 450.0),
      (5L, t0 + 90L * 1000000000L, 1L, "view", 9999.0),
      (6L, t0, 2L, "purchase", 499.99),
      (7L, t0, 3L, "purchase", 1200.0)))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("event_id"), col("cum_micros"),
        col("alert_level"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val tws = rows(EventStream.spendAlertsTws(spark, dir))
    assert(tws === Set(
      (1L, 3L, 600000000L, 1L),
      (1L, 4L, 1050000000L, 2L),
      (3L, 7L, 1200000000L, 2L)))
    assert(tws === rows(EventStream.spendAlerts(spark, dir)))
  }
}
