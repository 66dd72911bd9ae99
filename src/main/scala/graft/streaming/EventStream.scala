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
  private val stagedDirs = scala.collection.concurrent.TrieMap[String, String]()
  private def stageOnce(s: SparkSession, dir: String): String =
    stagedDirs.getOrElseUpdate(dir, {
      val staged = Sinks.tmpPath(s"stream_in_${new java.io.File(dir).getName}")
      s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
        .write.mode("overwrite").parquet(staged)
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
    val tag = new java.io.File(dir).getName
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
      // skip-existing anti-join
      .dropDuplicates("event_id")
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
}
