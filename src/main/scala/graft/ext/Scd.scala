package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history compression — the
  * versioned-dimension build a warehouse derives from a change log:
  * collapse each key's event stream into RUNS of consecutive equal
  * attribute values, each run becoming one version row with an
  * [effective_from, effective_to) validity interval and an `is_current`
  * flag on the open tail. This is the dimension-table twin of the
  * reference's last-write-wins upsert (SURVEY.md §2 S6/J3): the upsert
  * keeps only the latest value per key; SCD2 keeps every value with the
  * interval during which it was the latest.
  *
  * Classic gaps-and-islands: mark change points with `lag`, running-sum
  * the marks into a version number, aggregate each version, then `lead`
  * over versions for the closing bound. The first three steps all
  * partition by the key, so Spark plans ONE exchange for the two window
  * passes plus the aggregate; the final `lead` runs on the already-
  * compressed version rows (orders of magnitude smaller than the log).
  * State per key is bounded by the sort buffer, never by collect.
  *
  * Determinism: the sort key within a partition is (orderCol, tieCol) —
  * the tie-break column makes runs well-defined when two log rows share
  * a timestamp, so the same versions come out on any engine.
  */
object Scd {

  /** @param log      change log
    * @param keyCol   dimension key (partition)
    * @param orderCol event-time column (version order; intervals are on
    *                 this column)
    * @param tieCol   unique tie-break within (key, orderCol)
    * @param valueCol tracked attribute: a new version starts whenever
    *                 its value differs from the previous row's
    *                 (null-safe comparison — null→x and x→null are
    *                 changes, null→null is not)
    */
  def compressHistory(log: DataFrame, keyCol: String, orderCol: String,
                      tieCol: String, valueCol: String): DataFrame = {
    val byTime = Window.partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
    val prev: Column = lag(col(valueCol), 1).over(byTime)
    val marked = log.withColumn("_chg",
      // null-safe inequality: first row of the key (lag null with no
      // previous ROW) must also count as a change — row_number==1 makes
      // that explicit rather than conflating it with a null value
      when(row_number().over(byTime) === 1, 1L)
        .otherwise(when(col(valueCol) <=> prev, 0L).otherwise(1L)))
    val versions = marked
      .withColumn("version", sum(col("_chg")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"))
      .groupBy(col(keyCol), col("version"))
      .agg(
        min(col(valueCol)).as("value"), // constant within a run
        min(col(orderCol)).as("effective_from"),
        count(lit(1)).as("n_rows"))
    val byVersion = Window.partitionBy(keyCol).orderBy(col("version"))
    versions
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byVersion))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
