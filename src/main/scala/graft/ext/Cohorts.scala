package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the "of the users who first appeared in week W,
  * how many were active W+k weeks later" matrix, the canonical
  * engagement/retention analysis over an event log (and, for a
  * training-data pipeline, the same shape as "documents first crawled
  * in snapshot S still present in snapshot S+k" corpus-drift tracking).
  *
  * Week bucketing is `date_trunc('week', ts)` — Monday-based on both
  * engines — so cohort and activity weeks land on the same instants and
  * the day-difference is always an exact multiple of 7 (the integer
  * division below is exact, no floor-semantics exposure).
  *
  * Shapes at 100 TB: first-appearance is one map-side-combinable min
  * per user; the (user, week) distinct is one exchange on the same user
  * key (reused for the cohort join); the final matrix aggregate is over
  * rows already reduced to user-weeks. The two-phase countDistinct is
  * Spark's standard expand — exact, combinable. Output is
  * cohort-weeks × offsets — tiny regardless of input scale.
  */
object Cohorts {

  def retention(events: DataFrame, userCol: String,
                tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val activity = events
      .select(col(userCol),
        date_trunc("week", col(tsCol)).as("activity_week"))
      .distinct()
    activity.join(firstWeek, userCol)
      .withColumn("week_offset",
        (datediff(col("activity_week").cast("date"),
          col("cohort_week").cast("date")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
