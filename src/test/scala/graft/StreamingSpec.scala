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
