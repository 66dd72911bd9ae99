package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — for each user, the earliest timestamp at
  * which each stage of an ordered event sequence was completed, where a
  * stage only counts if it happens STRICTLY AFTER the previous stage
  * (the product-analytics "signup → view → purchase" conversion
  * question, and the same sequence-pattern shape a training-data
  * pipeline uses for multi-step interaction mining).
  *
  * Implementation: one unsorted window partition per user and one
  * conditional `min` per stage, each referencing the previous stage's
  * per-partition constant. The chain of Window nodes shares ONE
  * partitioning key, so Spark plans a single exchange and no sort
  * (every frame is the whole unbounded partition); the final per-user
  * collapse is a groupBy on the same key — still the same exchange.
  * State per user is one timestamp per stage, never the event list;
  * there is no self-join per stage (the naive SQL formulation), so the
  * event table is scanned and shuffled exactly once regardless of the
  * number of stages.
  */
object Funnel {

  /** @param events event log
    * @param userCol partition key
    * @param tsCol   event-time column
    * @param typeCol stage label column
    * @param stages  ordered stage labels (≥ 1); output has one
    *                `ts_<stage>` column per stage (earliest completion,
    *                null = never reached) plus `stages_reached`
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(userCol)
    val withTs = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val cond =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage && col(tsCol) > col(s"_ts_${i - 1}")
        df.withColumn(s"_ts_$i", min(when(cond, col(tsCol))).over(w))
    }
    val tsCols = stages.indices.map(i => max(col(s"_ts_$i")).as(s"ts_${stages(i)}"))
    val reached = stages.indices
      .map(i => when(max(col(s"_ts_$i")).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    withTs.groupBy(col(userCol))
      .agg(tsCols.head, tsCols.tail :+ reached.as("stages_reached"): _*)
  }
}
