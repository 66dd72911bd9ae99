package graft

import org.apache.spark.sql.functions._
import graft.ingest.RawZoneGen
import graft.streaming.StreamIvm
import graft.transform.Financials

/** Streaming materialized-view maintenance (streaming/StreamIvm, q131):
  * consuming the raw zone's days one micro-batch at a time and running
  * the q128 exact-IVM step per batch must converge to the SAME rollup
  * as a full recompute from the whole raw zone — the retraction math
  * has to survive the foreachBatch delivery path (nested executions,
  * lazy plans over files the upsert is about to rewrite) exactly as it
  * does under the batch scheduler.
  */
class StreamIvmSpec extends SparkSpec {

  test("streamed day-by-day maintenance equals the full recompute") {
    val syms = 10 // smallest universe; still has stale 10th-symbol rows
    val rawPath = RawZoneGen.stagedPath(spark, syms)

    val maintained = StreamIvm.maintainedRollup(spark, rawPath, "spec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

    // full recompute: normalize the ENTIRE raw zone in one shot (the
    // q38 path — its within-universe precedence law yields the same
    // final fact state the day-by-day upserts converge to), then
    // aggregate with the identical integer partials
    val valueQ = (col("value") * 4).cast("long")
    val recomputed = Financials.normalize(spark.read.parquet(rawPath))
      .groupBy("stock", "calendar_year")
      .agg(count(lit(1)).as("n_facts"),
        sum(when(col("value").isNotNull, 1L).otherwise(0L)).as("nn"),
        sum(valueQ).as("sum_q"))
      .select(col("stock"), col("calendar_year"), col("n_facts"),
        when(col("nn") === 0L, lit(null).cast("double"))
          .otherwise(col("sum_q").cast("double") / 4.0).as("sum_value"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet

    assert(maintained.nonEmpty)
    assert(maintained === recomputed)
  }

  test("MVCC variant converges identically and absorbs batch re-delivery") {
    val syms = 10
    val rawPath = RawZoneGen.stagedPath(spark, syms)
    val raw = spark.read.parquet(rawPath)
      .select(col("symbol"), col("payload"), col("loaded_at"),
        col("load_date").cast("date"))

    def served = StreamIvm.maintainedRollupMvcc(spark, rawPath, "mvccspec")
    val first = served.collect().map(_.toSeq).toSet
    val inPlace = StreamIvm.maintainedRollup(spark, rawPath, "mvccspec")
      .collect().map(_.toSeq).toSet
    assert(first.nonEmpty)
    assert(first === inPlace) // both streaming paths, identical table

    // at-least-once re-delivery: re-apply a MIDDLE batch and the LAST
    // batch with their original commit ids (the foreachBatch retry
    // contract). Every re-application must land byte-identically —
    // retraction inputs are the immutable commits < b, and the writes
    // overwrite only the batch's own commit directories.
    val factLog = graft.sources.Sinks.tmpPath("stream_ivm_mvcc_fact_mvccspec")
    val rollLog = graft.sources.Sinks.tmpPath("stream_ivm_mvcc_roll_mvccspec")
    val days = raw.select(col("load_date")).distinct()
      .collect().map(_.getDate(0).toString).sorted
    Seq(1, days.length - 1).distinct.foreach { i =>
      StreamIvm.applyBatchMvcc(spark,
        raw.filter(col("load_date") === lit(days(i))), i.toLong,
        factLog, rollLog)
      val after = spark.read.parquet(rollLog)
        .groupBy(col("stock"), col("calendar_year"))
        .agg(sum(col("n_facts")).as("n_facts"), sum(col("nn")).as("nn"),
          sum(col("sum_q")).as("sum_q"))
        .filter(col("n_facts") =!= 0L)
        .select(col("stock"), col("calendar_year"), col("n_facts"),
          when(col("nn") === 0L, lit(null).cast("double"))
            .otherwise(col("sum_q").cast("double") / 4.0).as("sum_value"))
        .collect().map(_.toSeq).toSet
      assert(after === first, s"re-delivery of batch $i changed the rollup")
    }
  }
}
