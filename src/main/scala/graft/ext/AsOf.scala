package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series lookup Spark's built-in join
  * set lacks (DuckDB/kdb/Pandas `ASOF JOIN`): for every left row, attach
  * the single right row with the greatest right timestamp ≤ the left
  * timestamp within the same key (event→latest-prior-state attribution:
  * purchase→last click, trade→last quote, reading→last calibration).
  *
  * Implementation is the union-sort shape, NOT a range join: tag both
  * sides, union, and run ONE analytic window per key ordered by
  * (timestamp, side) carrying the last right-side payload forward. Cost
  * is a single shuffle on the key plus a per-key sort — the same
  * exchange a groupBy would pay — versus a ts-inequality join, which
  * Catalyst can only execute as a per-key cartesian filter (O(L·R) per
  * key). Skewed keys are one sort partition's problem (AQE-sized);
  * state per row is one payload struct, so the plan survives any scale
  * the sort does.
  *
  * Determinism: ties on the timestamp sort (side, then the payload
  * struct itself) — equal-ts right rows resolve to the struct-greatest
  * payload, and a right row AT the left timestamp is visible to it
  * (inclusive, matching DuckDB `ON l.ts >= r.ts`).
  */
object AsOf {

  /** @param payload right-side columns to carry (rightTs rides along
    *                automatically); emitted as `prefix + name`. Nullable
    *                payload columns are safe: the carried value is the
    *                whole row STRUCT, so a null field never falls back to
    *                an older row's value.
    * @param toleranceUs optional max staleness in microseconds (pandas
    *                `merge_asof(tolerance=…)` / kdb window-join): a
    *                matched right row older than `leftTs − tolerance` is
    *                reported as no-match. Applied AFTER the carry — a
    *                filter on the result columns, so the plan shape is
    *                unchanged.
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   prefix: String = "asof_",
                   toleranceUs: Option[Long] = None): DataFrame = {
    val carried = (rightTs +: payload.filterNot(_ == rightTs)).distinct
    // loud contract, not silent clobbering: the four internal working
    // columns are reserved, and a prefixed output name may not shadow a
    // left column
    val internal = Seq("_ts", "_side", "_p", "_asof")
    val reserved = (left.columns ++ right.columns).filter(internal.contains)
    require(reserved.isEmpty,
      s"joinBackward reserves column name(s) ${reserved.mkString(", ")}; " +
        "rename them on the input")
    val shadowed = carried.map(prefix + _).filter(left.columns.contains)
    require(shadowed.isEmpty,
      s"asof output column(s) ${shadowed.mkString(", ")} would shadow " +
        "left columns — pass a different prefix")
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(carried.map(col): _*).as("_p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = toleranceUs.fold(matched) { tol =>
      matched.withColumn("_asof",
        when(unix_micros(col("_ts")) -
          unix_micros(col(s"_asof.$rightTs")) <= tol, col("_asof")))
    }
    bounded.select(left.columns.toSeq.map(col) ++
      carried.map(c => col(s"_asof.$c").as(s"$prefix$c")): _*)
  }
}
