package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-resistant grouped top-k — "the k best rows per group" computed
  * so that no single machine ever sorts a whole group.
  *
  * Where the single-window form (q07) actually hurts at scale: since
  * Spark 3.5 the `WindowGroupLimit` rule already prunes a
  * `row_number() <= k` filter MAP-SIDE (each task keeps k rows per
  * group before the exchange — visible as `WindowGroupLimit … Partial`
  * in the plan), so shuffle volume is fine either way. The residual
  * hot spot is the REDUCE side: all numMapTasks·k survivors of a group
  * still converge on ONE task for the final rank. With few, hot groups
  * — the 100 TB norm: 5 event types over billions of events, a
  * 100k-task scan — that is one task merging 100k·k rows per type
  * while the rest of the cluster idles.
  *
  * Two-phase form instead:
  *   1. LOCAL top-k per (group, salt): the salt — a deterministic hash
  *      of a caller-named disambiguator column, no RNG — spreads each
  *      group's reduce work over `salts` tasks; each keeps the k best
  *      of its bucket (map-side WindowGroupLimit pruning applies here
  *      too). Rows ranked > k within their salt bucket cannot be in
  *      the global top-k (their bucket already holds k better rows).
  *   2. GLOBAL top-k over the ≤ salts·k survivors per group — a
  *      trivially small final sort, capped by `salts`, not by the
  *      map-task count.
  *
  * Exactness: phase 1 is a pure pruning step (any global top-k row is
  * within the top k of whatever bucket it landed in), so the result is
  * row-identical to the single-window form — same rows, same ranks —
  * for any total `order`. Pass a TOTAL order (e.g. value desc, id asc)
  * or ranks at ties are engine-dependent.
  *
  * Sizing: salts ≈ (map tasks · k that one reduce task can't absorb) /
  * (rows a healthy task sorts); salts·k stays small vs a partition.
  */
object TopK {

  /** The k best rows per group under `order`, with their global rank.
    *
    * @param groupCols grouping columns
    * @param order     total-order sort keys, best first (e.g.
    *                  `Seq(col("value").desc, col("event_id"))`)
    * @param saltFrom  column whose hash spreads a group across buckets
    *                  (a PK or timestamp; constants degrade to the
    *                  plain single-sort plan, not to wrong results)
    * @param salts     phase-1 fan-out (≥ 1)
    * @param rankCol   output column name for the 1-based global rank
    */
  def groupedTopK(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                  k: Int, saltFrom: String, salts: Int,
                  rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // loud contract, not silent clobbering (same guard as Skew/AsOf)
    val internal = Seq("_tk_salt", "_tk_rn", rankCol)
    val reserved = df.columns.filter(internal.contains)
    require(reserved.isEmpty,
      s"groupedTopK reserves column name(s) ${reserved.distinct.mkString(", ")}; " +
        "rename them on the input")
    val localW = Window
      .partitionBy((groupCols.map(col) :+ col("_tk_salt")): _*)
      .orderBy(order: _*)
    val globalW = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_tk_salt", pmod(hash(col(saltFrom)), lit(salts)))
      .withColumn("_tk_rn", row_number().over(localW))
      .filter(col("_tk_rn") <= k)
      .drop("_tk_salt", "_tk_rn")
      .withColumn(rankCol, row_number().over(globalW))
      .filter(col(rankCol) <= k)
  }
}
