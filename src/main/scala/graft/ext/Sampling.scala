package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextHash.hash60

/** Deterministic stratified sampling — the corpus-mixing primitive of a
  * training-data pipeline (downsample the over-represented language /
  * source, keep the rare one whole). NO RNG anywhere: the keep/drop
  * decision is a pure function of (salt, id) via the cross-engine md5
  * hash contract (TextHash), so a run is reproducible row-for-row on
  * any cluster size, resumable, and auditable — and the DuckDB oracle
  * recomputes the identical sample.
  *
  * Shape: a filter — embarrassingly parallel, no shuffle, pushes
  * nothing but a projection into the scan. At 100 TB sampling is a
  * single pass; changing the salt yields an independent resample.
  */
object Sampling {

  /** Basis points of the hash space (rate resolution 0.01%). */
  val Denom = 10000L

  /** Keep a row iff hash(salt|id) mod 10000 < rate(stratum)·10000.
    * Rates are per-stratum with a default for unlisted strata; each is
    * rounded to basis points ONCE on the driver so both engines compare
    * against the same integer threshold.
    */
  def stratifiedBernoulli(df: DataFrame, idCol: String, strataCol: String,
                          rates: Map[String, Double], defaultRate: Double,
                          salt: String): DataFrame = {
    val threshold = rates.foldRight(lit(math.round(defaultRate * Denom))) {
      case ((stratum, rate), rest) =>
        when(col(strataCol) === stratum, lit(math.round(rate * Denom)))
          .otherwise(rest)
    }
    df.filter(
      hash60(concat(lit(salt), col(idCol).cast("string"))) % Denom < threshold)
  }
}
