package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order (Markov) transition matrix over keyed event sequences —
  * the sequence-mining summary behind "what do users do after X":
  * session-path analysis, UI-flow audits, and the state-machine sanity
  * checks a pipeline runs on its own event logs. Complements the funnel
  * (q80: a FIXED ordered pattern) with the full empirical transition
  * graph.
  *
  * Shape at 100 TB: one exchange on the sequence key for the `lead`
  * window (the per-key sort is bounded by that key's event count — the
  * same partitioning every per-user operator here uses), then one
  * combinable aggregation to the (from, to) matrix, whose cardinality
  * is |states|² — tiny. The per-from-state normalization runs over the
  * *aggregated matrix*, not the events. Probabilities are exact
  * fixed-point ppm (integer division, the q61/q77 contract) so engines
  * agree bit-for-bit.
  */
object Transitions {

  /** Count and normalize state→next-state transitions per ordered
    * sequence. Ordering within a key is (tsCol, tieCol) — total, so the
    * lead is deterministic. Output: from_state, to_state, n,
    * out_total, p_ppm = ⌊n·10⁶ / out_total⌋.
    */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, stateCol: String): DataFrame = {
    for (r <- Seq("_next", "from_state", "to_state", "n", "out_total",
        "p_ppm"))
      require(!df.columns.contains(r),
        s"input must not contain reserved column $r")
    val seq = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .withColumn("_next", lead(col(stateCol), 1).over(seq))
      .filter(col("_next").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("_next").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_state"))
    pairs
      .withColumn("out_total", sum(col("n")).over(byFrom))
      .withColumn("p_ppm", expr("n * 1000000L div out_total"))
  }
}
