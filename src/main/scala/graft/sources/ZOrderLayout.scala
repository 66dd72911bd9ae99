package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.ZOrderExpr

/** Z-order clustered parquet layout: range-partition + sort the table by
  * the Morton interleave of two filter columns, so 2-D box predicates
  * prune files AND row groups on both columns' min/max statistics.
  *
  * Complements the 1-D layouts in Sinks: bucket-by-key serves point
  * lookups (q57) and co-located joins (q56); PK-prefix sort serves range
  * scans on the leading key; Z-order serves the analytic slice "x in
  * [a,b] AND y in [c,d]" where neither column alone is selective enough
  * to lead a sort. At 100 TB this is the difference between scanning
  * ~(selectivity_x × selectivity_y) of the table and scanning
  * min(selectivity_x, 1) of it.
  *
  * The write is ONE exchange (range repartition on z) + in-partition
  * sort — the same cost as any clustered write; z is computed, used for
  * placement, and dropped (it is derivable, not schema).
  */
object ZOrderLayout {

  private val ZCol = "_graft_z"

  /** Write `df` z-clustered on (xCol, yCol) into `numFiles` files.
    * Coordinates must be non-negative and < 2^bits (ZOrderExpr throws
    * loudly otherwise); NULL coordinates are excluded from the layout —
    * callers with nullable filter columns should route nulls to a
    * separate partition (a null coordinate cannot be placed on, or
    * pruned by, the curve).
    */
  def write(df: DataFrame, xCol: String, yCol: String, bits: Int,
            numFiles: Int, path: String): Unit = {
    require(!df.columns.contains(ZCol), s"$ZCol is reserved by ZOrderLayout")
    df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .withColumn(ZCol,
        ZOrderExpr.zorder2(col(xCol).cast("long"), col(yCol).cast("long"), bits))
      .repartitionByRange(numFiles, col(ZCol))
      .sortWithinPartitions(ZCol)
      .drop(ZCol)
      .write.mode("overwrite").parquet(path)
  }
}
