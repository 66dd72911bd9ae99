package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing time-RANGE window aggregation — the moving-average family
  * (7-day revenue, 30-day active spend) every reporting layer derives
  * from an event/fact table. Exercises the window-frame surface the
  * rank/lag queries (q07/q08) don't: a RANGE frame over an ordinal key,
  * where the frame holds *values within a distance*, not *N physical
  * rows* — gap days must widen the physical frame, which a ROWS frame
  * gets wrong.
  *
  * Scale discipline: the window does NOT run over the raw fact rows.
  * The input is first collapsed to one row per (partition, day) by an
  * ordinary combinable aggregate (map-side partials, one exchange), so
  * the window's sort cardinality is |partitions| × |days| — bounded by
  * the calendar, not the data. 100 TB of events over 3 years is ≤ ~1.1k
  * rows per partition key under the window, regardless of input size.
  * Determinism: day totals sum as DECIMAL(28,6) (order-independent),
  * and the trailing average is ONE double division of two exact values.
  */
object Rolling {

  /** Per-(group, day) totals plus an N-day trailing sum/avg.
    *
    * Output: groupCol, day, day_total, trail_total, trail_days,
    * trail_avg — where trail_* aggregate the RANGE frame
    * [day − (days−1), day] within the group.
    */
  /** Output/working column names the input must not already use (the
    * saltedJoin/AsOf reserved-name discipline: collide loudly, never
    * silently clobber).
    */
  private val Reserved = Seq("day", "day_id", "day_total", "day_total_dec",
    "trail_total", "trail_total_dec", "trail_days", "trail_avg")

  def trailingDaily(df: DataFrame, groupCol: String, tsCol: String,
                    valueCol: String, days: Int): DataFrame = {
    require(days > 0, s"days must be > 0, got $days")
    for (r <- Reserved)
      require(!df.columns.contains(r),
        s"input must not contain reserved column $r")
    require(!Reserved.contains(groupCol),
      s"groupCol must not be one of ${Reserved.mkString(",")}")
    val daily = df
      .groupBy(col(groupCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(DecimalType(28, 6))).as("day_total_dec"))
    // integer day ordinal so the RANGE frame is exact integer distance
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("day_id"))
      .rangeBetween(-(days - 1), 0)
    daily
      .withColumn("day_id", datediff(col("day"), to_date(lit("1970-01-01"))))
      .withColumn("trail_total_dec", sum(col("day_total_dec")).over(w))
      .withColumn("trail_days", count(lit(1)).over(w).cast("int"))
      .select(col(groupCol), col("day"),
        col("day_total_dec").cast("double").as("day_total"),
        col("trail_total_dec").cast("double").as("trail_total"),
        col("trail_days"),
        (col("trail_total_dec").cast("double") /
          col("trail_days").cast("double")).as("trail_avg"))
  }
}
