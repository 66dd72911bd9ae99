package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill (last observation carried
  * forward) — the time-series alignment operator every metrics /
  * feature-engineering pipeline needs before joining irregular event
  * streams onto a model's fixed time grid. The reference's pipeline
  * has the inverse problem (quarterly facts already on a grid); this
  * is the general form: per key, snap observations to fixed buckets
  * (latest observation wins within a bucket), generate the COMPLETE
  * bucket range between the key's first and last observation, and
  * carry the last seen value across empty buckets.
  *
  * Spark-first shape: one partial-aggregable groupBy collapses the
  * stream to ≤1 row per (key, bucket); the grid comes from
  * `sequence()` + `explode` (distributed generation — each key's grid
  * is built on the executor holding that key, never on the driver);
  * the fill is one `last(_, ignoreNulls)` running window per key. Two
  * exchanges total (bucket agg, key window), both on the same `key`
  * column at 100 TB — and the window's frame is the default running
  * frame, so Spark evaluates it in one pass over each sorted
  * partition, O(grid) memory.
  *
  * Determinism: buckets are integer floor-division of epoch micros —
  * no calendar/timezone arithmetic; "latest wins" ties break on the
  * ordering column (`orderCol`, e.g. an event id); the filled value
  * is COPIED, never computed, so doubles cross engines bit-exactly.
  *
  * Scale note (100 TB): grid size per key is span/step, independent
  * of event count — a key active for a year at 6-hour steps is 1 460
  * rows. Degenerate "one hot key spans decades at 1-second steps"
  * inputs are a config review, not an operator limitation: `sequence`
  * allocates per-row arrays bounded by `spark.sql.maxSinglePartitionBytes`
  * long before executor memory is at risk.
  */
object Resample {

  /** @param df       input events
    * @param keyCol   grouping key (grid is generated per key)
    * @param tsCol    event-time column (timestamp)
    * @param valueCol observed value to carry forward
    * @param orderCol tie-break for simultaneous observations (max wins)
    * @param stepMicros grid step in microseconds
    * @return (key, bucket_start timestamp, value_ffill) — one row per
    *         grid bucket from the key's first to last observed bucket
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, orderCol: String,
                    stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be > 0, got $stepMicros")
    // `div`, not `/`: Column./ is IEEE double division, and a quotient
    // a hair below an integer can round UP across the bucket boundary
    val b = expr(s"unix_micros(`$tsCol`) div ${stepMicros}L")
    // latest observation per (key, bucket): max_by is a partial-aggregable
    // aggregate — no row_number shuffle-then-filter needed
    val obs = df
      .select(col(keyCol).as("k"), b.as("bucket"),
        struct(col(tsCol), col(orderCol)).as("ord"), col(valueCol).as("v"))
      .groupBy(col("k"), col("bucket"))
      .agg(max_by(col("v"), col("ord")).as("v"))
    // per-key grid: sequence(minBucket, maxBucket) exploded where the key
    // lives; re-join the observations on the SAME (k) partitioning
    val grid = obs.groupBy(col("k"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("k"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("k", "bucket"), "left")
      .select(col("k").as(keyCol),
        timestamp_micros(col("bucket") * stepMicros).as("bucket_start"),
        last(col("v"), ignoreNulls = true).over(w).as("value_ffill"))
  }
}
