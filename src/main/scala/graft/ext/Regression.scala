package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise ordinary-least-squares trend fit — "is this metric
  * drifting, per segment" — as ONE partial-aggregable pass: the five
  * moments (n, Σx, Σy, Σx², Σxy) are plain integer sums, and slope =
  * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) is derived in the final
  * projection. No per-group iteration, no ML library, no second scan.
  *
  * Determinism contract: inputs are INTEGER columns (the caller
  * quantizes — epoch-hour x, ppm y), every moment is an exact integer
  * sum (order-independent), and the slope is emitted in ppm by
  * integer division with EXPLICIT sign handling — `-((-num)·10⁶ div
  * den)` when the numerator is negative — because engines disagree on
  * whether integral division of negatives truncates or floors;
  * routing both engines through non-negative operands makes them
  * agree by construction (the denominator, a scaled variance, is
  * never negative; zero variance → NULL slope). The final arithmetic
  * runs in DECIMAL(38)/HUGEINT: n·Σxy overflows a long at ~10⁵ rows
  * per group even with small x, while the per-row products and the
  * sums themselves stay comfortably in long range.
  *
  * Shape at 100 TB: identical to any sum-based aggregate — map-side
  * partial moments collapse each partition to one row per group
  * before the single exchange. This is why OLS-by-moments is the
  * distributed form: the textbook two-pass (means first, residuals
  * second) costs a second full scan for zero extra exactness here.
  */
object Regression {

  /** @param xCol integral regressor (e.g. hours since a fixed epoch —
    *             keep |x| small: per-row x·y must fit in a long)
    * @param yCol integral response (e.g. ppm-quantized metric)
    * @return (group, n, x_mean_ppm, y_mean_ppm, slope_ppm) — slope in
    *         y-units per x-unit, ppm; NULL when x has zero variance
    */
  def groupOls(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col(groupCol), col("n"),
        expr("sx * 1000000L div n").as("x_mean_ppm"),
        expr("sy * 1000000L div n").as("y_mean_ppm"),
        expr("""CASE
            WHEN CAST(n AS DECIMAL(20,0)) * sxx
               - CAST(sx AS DECIMAL(20,0)) * sx = 0 THEN NULL
            WHEN CAST(n AS DECIMAL(20,0)) * sxy
               - CAST(sx AS DECIMAL(20,0)) * sy < 0
            THEN -CAST((-(CAST(n AS DECIMAL(20,0)) * sxy
                          - CAST(sx AS DECIMAL(20,0)) * sy) * 1000000)
                 div (CAST(n AS DECIMAL(20,0)) * sxx
                      - CAST(sx AS DECIMAL(20,0)) * sx) AS BIGINT)
            ELSE CAST(((CAST(n AS DECIMAL(20,0)) * sxy
                        - CAST(sx AS DECIMAL(20,0)) * sy) * 1000000)
                 div (CAST(n AS DECIMAL(20,0)) * sxx
                      - CAST(sx AS DECIMAL(20,0)) * sx) AS BIGINT)
          END""").as("slope_ppm"))
}
