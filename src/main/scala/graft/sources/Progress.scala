package graft.sources

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** A4 — progress counters (reference `total_rows += upserted` /
  * `skipped` / `error` tallies printed per batch: Financilas.py:229–247,
  * Summary.py:274–309, details.py:283–305).
  *
  * Engine analogue: `Dataset.observe` metrics — aggregates computed
  * INSIDE the job that materializes the frame (a CollectMetrics node in
  * the plan, folded into whole-stage codegen), not a second `count()`
  * pass over the pipeline. The driver reads the totals after the action
  * from the `Observation` handle; on a cluster the same metrics stream
  * to listeners per task, which is exactly what a progress display
  * needs at 100 TB — zero extra scans, zero extra shuffles.
  */
object Progress {

  /** Attach row/null-key counters to a frame. `Observation.get` blocks
    * until the observed frame has been materialized by an action, then
    * yields Map("rows" -> …, "null_keys" -> …).
    */
  def observed(df: DataFrame, keyCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val withMetrics = df.observe(obs,
      count(lit(1)).as("rows"),
      count(when(col(keyCol).isNull, 1)).as("null_keys"))
    (withMetrics, obs)
  }

  /** The reference's two-sided upsert tally — `upserted` (incoming rows
    * applied) and `kept` (existing rows that survived) — from a single
    * merged-output pass: callers tag rows with a generation column
    * before the merge (Upsert.upsert's `_gen` convention) and the
    * metrics split on it.
    */
  def observedMerge(merged: DataFrame, genCol: String): (DataFrame, Observation) = {
    val obs = Observation()
    val withMetrics = merged.observe(obs,
      count(lit(1)).as("rows"),
      count(when(col(genCol) === 1, 1)).as("upserted"),
      count(when(col(genCol) === 0, 1)).as("kept"))
    (withMetrics, obs)
  }
}
