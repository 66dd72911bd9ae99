package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic categorical dictionary (label) encoding — the
  * feature-engineering staple that turns a string category into the
  * dense 0-based integer id an embedding table indexes (the reference
  * pipeline's categorical columns — sector, industry, currency — all
  * feed models this way downstream).
  *
  * The dictionary is the SORTED distinct vocabulary: ids are stable
  * under re-runs and across engines (no hash, no arrival order), and
  * contiguous (id ∈ [0, |V|), exactly what an embedding matrix wants).
  * Determinism is the whole point — a training pipeline that re-derives
  * ids per run shuffles its embedding rows silently.
  *
  * Scale: the id assignment is one window over the DISTINCT vocabulary
  * — the aggregate's output, metadata-sized for real categorical
  * columns (thousands, not billions), so the single-task sort ranks
  * categories, never corpus rows. A genuinely huge vocabulary (open
  * vocab ids over raw tokens) should ride
  * [[Interleave.bucketedGroupRank]] instead — same contract, bucketed
  * prefix-sum rank. Encoding is a broadcast equi-join: the corpus
  * never shuffles.
  */
object Encoding {

  /** (value, id) dictionary over `valueCol`'s non-null distinct values,
    * ids 0-based dense in sorted order.
    */
  def dictionary(df: DataFrame, valueCol: String,
                 idCol: String): DataFrame =
    df.select(col(valueCol)).where(col(valueCol).isNotNull).distinct()
      .withColumn(idCol,
        (row_number().over(Window.orderBy(col(valueCol))) - 1).cast("int"))

  /** Attach the dictionary's id column; unseen/null values (not in the
    * dictionary) encode as null — the caller decides between an OOV
    * bucket and a loud failure.
    */
  def encode(df: DataFrame, dict: DataFrame, valueCol: String): DataFrame =
    df.join(broadcast(dict), Seq(valueCol), "left")
}
