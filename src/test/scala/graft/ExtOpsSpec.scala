package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ext.{Multimodal, Sessions}

/** Sessionization (gaps-and-islands) and the multimodal batched-decode
  * plumbing.
  */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap splits, window semantics, duration") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2025-01-01 10:00:00")),
      (1L, t("2025-01-01 10:10:00")), // 10 min gap — same session
      (1L, t("2025-01-01 11:00:00")), // 50 min gap — NEW session
      (2L, t("2025-01-01 10:05:00"))) // other user, own session
      .toDF("user_id", "ts")
    val got = Sessions.sessionize(events, "user_id", "ts", 30)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("sess_seq"),
        r.getAs[Timestamp]("win_start").toString,
        r.getAs[Timestamp]("win_end").toString,
        r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"))).toSet
    assert(got === Set(
      (1L, 1, "2025-01-01 10:00:00.0", "2025-01-01 10:40:00.0", 2L, 600000000L),
      (1L, 2, "2025-01-01 11:00:00.0", "2025-01-01 11:30:00.0", 1L, 0L),
      (2L, 1, "2025-01-01 10:05:00.0", "2025-01-01 10:35:00.0", 1L, 0L)))
  }

  test("sessionize: exact 30-minute gap does NOT split (strict inequality)") {
    def t(s: String) = Timestamp.valueOf(s)
    val events = Seq((1L, t("2025-01-01 10:00:00")), (1L, t("2025-01-01 10:30:00")))
      .toDF("user_id", "ts")
    assert(Sessions.sessionize(events, "user_id", "ts", 30).count() === 1L)
  }

  test("multimodal: stub features match a driver-side byte recompute") {
    val docs = Seq((7L, "abc"), (8L, ""), (9L, "Hello, multimodal!"))
      .toDF("doc_id", "text")
    val got = Multimodal.featurize(Multimodal.mediaTable(docs, "doc_id", "text"))
      .collect().map(f => f.media_id -> f).toMap
    val abc = got(7L)
    assert(abc.n_bytes === 3L)
    assert(abc.byte_sum === ('a' + 'b' + 'c').toLong)
    assert(abc.first_byte === 'a'.toInt && abc.last_byte === 'c'.toInt)
    assert(abc.format === "wav" && abc.width === 512 && abc.height === 144)
    val empty = got(8L)
    assert(empty.n_bytes === 0L && empty.byte_mean === 0.0 &&
      empty.first_byte === -1 && empty.last_byte === -1)
  }

  test("multimodal: decode is batched and narrow (no shuffle, partitioning preserved)") {
    val docs = (0 until 200).map(i => (i.toLong, s"doc number $i"))
      .toDF("doc_id", "text").repartition(4)
    // batch shape: a counting decoder observes every batch ≤ batchSize
    val media = Multimodal.mediaTable(docs, "doc_id", "text")
    val sizes = media.sparkSession.sparkContext.collectionAccumulator[Int]("batches")
    val counting = new Multimodal.MediaDecoder {
      def decodeBatch(b: Seq[graft.ext.MediaRow]): Seq[graft.ext.MediaFeatures] = {
        sizes.add(b.size)
        Multimodal.StubDecoder.decodeBatch(b)
      }
    }
    val out = Multimodal.featurize(media, counting, batchSize = 16)
    assert(out.count() === 200L)
    assert(sizes.value.size() >= 200 / 16) // ran in batches, not per-row
    sizes.value.forEach(s => assert(s <= 16))
    // narrow: the ONLY exchange is the fixture's own repartition(4) —
    // featurize adds none (MapPartitions directly over the projection)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") === 1)
  }
}
