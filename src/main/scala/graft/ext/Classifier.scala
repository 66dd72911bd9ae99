package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-classifier INFERENCE — the CCNet-style model-based filter
  * that completes the curation story: a trained linear model over
  * per-document profile features (q27's n_tokens / avg_token_len /
  * stopword_ratio family), applied corpus-wide to produce a score and a
  * keep/drop decision. Training happens offline (any toolkit, any
  * sample); THIS operator is the deployment path, and the reference's
  * analogue is its imperative row-wise enrichment loops (Summary.py) —
  * here one declarative projection.
  *
  * Shape at 100 TB: a linear model is SMALL — its natural deployment is
  * literal weights folded into whole-stage codegen, NOT a broadcast
  * join (there is nothing to join: every row uses every weight). The
  * feature vector and weight vector meet in the native vec_dot
  * expression (plans/VectorExprs — codegen'd left-to-right fold, zero
  * per-row allocation), so inference is one embarrassingly-parallel
  * projection over the profile table: no shuffle, no state, no model
  * service round-trips.
  *
  * Determinism contract: score = ((0 + f₀·w₀) + f₁·w₁) + … + bias is a
  * FIXED IEEE operation sequence (vec_dot's fold order), reproducible
  * bit-for-bit by the oracle's identical left-to-right arithmetic; the
  * keep decision is a plain >= against a literal threshold. A sigmoid
  * is deliberately NOT applied: it is monotonic, so thresholding the
  * raw score decides identically while avoiding cross-engine `exp`
  * last-ulp divergence (probabilities, when needed, are a display-side
  * concern).
  */
object Classifier {

  /** Score each row: `score = vec_dot(features, weights) + bias`,
    * `keep = score >= threshold`. Feature columns are cast to double in
    * the given order — the order IS part of the model.
    */
  def scoreLinear(features: DataFrame, idCol: String,
                  featureCols: Seq[String], weights: Seq[Double],
                  bias: Double, threshold: Double): DataFrame = {
    require(featureCols.nonEmpty, "at least one feature required")
    require(featureCols.size == weights.size,
      s"got ${featureCols.size} features but ${weights.size} weights")
    for (r <- Seq("score", "keep"))
      require(!features.columns.contains(r),
        s"input must not contain reserved column $r")
    val f = array(featureCols.map(c => col(c).cast("double")): _*)
    val w = array(weights.map(lit): _*)
    val score = graft.plans.VectorExprs.vecDot(f, w) + lit(bias)
    features.select(
      (col(idCol) +: featureCols.map(col)) :+
        score.as("score") :+
        (score >= lit(threshold)).as("keep"): _*)
  }

  /** Percentile-rank normalization of a score column — the step between
    * raw classifier scores and a portable "keep the top X%" policy:
    * raw score scales drift with every retrain, but the score's RANK
    * within its stratum doesn't, so curation thresholds are expressed
    * in percentile space. pr_ppm = (rank − 1)·10⁶ div (n − 1), pure
    * integer over a deterministic total order (score, then id as the
    * tie-break), 0 for singleton strata — no IEEE division to disagree
    * about.
    *
    * Shape at 100 TB: one window per stratum (rank + count share the
    * same partitioning — a single exchange). Ranking is the inherently
    * global-per-stratum operation; partitioning by stratum
    * (language/source) keeps each sort machine-local. For a truly
    * unsplittable stratum the approx-percentile cutoff (q65) is the
    * sketch-side alternative; THIS operator is the exact path.
    */
  def percentileNormalize(scored: DataFrame, idCol: String,
                          scoreCol: String,
                          partitionCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    for (r <- Seq("rank", "n", "pr_ppm"))
      require(!scored.columns.contains(r),
        s"input must not contain reserved column $r")
    val part = partitionCols.map(col)
    val w = Window.partitionBy(part: _*)
      .orderBy(col(scoreCol), col(idCol))
    val wAll = Window.partitionBy(part: _*)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("pr_ppm",
        when(col("n") === 1, lit(0L))
          .otherwise(expr("(rank - 1) * 1000000 div (n - 1)")))
  }
}
