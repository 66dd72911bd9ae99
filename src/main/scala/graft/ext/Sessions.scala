package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the batch twin of
  * Structured Streaming's `session_window` (and of what
  * `flatMapGroupsWithState` sessionization computes): a session is a
  * maximal run of a user's events where consecutive gaps stay within
  * `gapMinutes`; the session window extends `gapMinutes` past the last
  * event, matching session_window's [first, last + gap) semantics.
  *
  * Scale shape: two analytic windows partitioned BY USER (per-user sort,
  * never a global one — the classic gaps-and-islands plan) plus one
  * aggregation on (user, session). State per task is one user's event
  * run; skewed power-users are one partition's problem and AQE-sized.
  * Gap arithmetic is integer microseconds (unix_micros) on both engines
  * — no sub-second truncation disagreements.
  */
object Sessions {

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col("us"))
    val marked = events
      .withColumn("us", unix_micros(col(tsCol)))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      // session break: first event, or gap strictly greater than the cap
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_seq",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked
      .groupBy(col(userCol), col("sess_seq"))
      .agg(
        min(col(tsCol)).as("win_start"),
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        timestamp_micros(max(col("us")) + gapUs).as("win_end"))
      .select(col(userCol), col("sess_seq").cast("int").as("sess_seq"),
        col("win_start"), col("win_end"), col("n_events"), col("duration_us"))
  }
}
