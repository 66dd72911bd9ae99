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

  /** Deterministic train/val/test assignment — the split twin of the
    * Bernoulli sampler: every row gets a split LABEL from the same
    * hash-bucket law instead of a keep/drop decision, so the three sets
    * are disjoint, exhaustive, reproducible on any cluster, and STABLE
    * UNDER CORPUS GROWTH (a document's split never changes when other
    * documents arrive — the property random shuffling cannot give, and
    * the reason eval contamination stays fixed across dataset
    * versions). Pure projection, no shuffle.
    *
    * @param cuts (label, weight) in order; weights are rounded to basis
    *             points once on the driver and turned into cumulative
    *             thresholds — the LAST label takes the remainder of the
    *             hash space, so weights need not sum to exactly 1.
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                cuts: Seq[(String, Double)]): DataFrame = {
    require(cuts.nonEmpty, "at least one split label required")
    val b = hash60(concat(lit(salt), col(idCol).cast("string"))) % Denom
    val thresholds = cuts.init.scanLeft(0L) {
      case (acc, (_, w)) => acc + math.round(w * Denom)
    }.tail
    val split = cuts.init.zip(thresholds)
      .foldRight(lit(cuts.last._1): org.apache.spark.sql.Column) {
        case (((label, _), hi), rest) => when(b < hi, label).otherwise(rest)
      }
    df.withColumn("split", split)
  }

  /** Deterministic WEIGHTED Bernoulli sample — keep probability
    * proportional to a per-row non-negative integer weight (quality
    * score, length, citation count): the importance-sampling step of
    * corpus mixing ("prefer higher-quality documents"), still with NO
    * RNG. A row is kept iff
    *
    *   (hash(salt|id) mod 10⁴) · max(weight)  <  weight · 10⁴
    *
    * i.e. P(keep) ≈ weight / max(weight) — and the decision is pure
    * INTEGER arithmetic end-to-end (cross-multiplied, no division, no
    * rounding), so the DuckDB oracle recomputes the identical sample
    * and no float-rounding boundary can ever flip a row.
    *
    * Shape: one tiny max-aggregate (combinable, broadcast back as a
    * 1-row literal frame) + a scan-level filter. The max is the only
    * coordination; at 100 TB it is a metadata-sized job.
    */
  def weightedBernoulli(df: DataFrame, idCol: String, weightCol: String,
                        salt: String): DataFrame = {
    require(!df.columns.contains("_max_w"),
      "input must not contain reserved column _max_w")
    val mx = df.agg(max(col(weightCol)).cast("long").as("_max_w"))
    df.crossJoin(broadcast(mx))
      .filter(
        hash60(concat(lit(salt), col(idCol).cast("string"))) % Denom
          * col("_max_w")
          < col(weightCol).cast("long") * Denom)
      .drop("_max_w")
  }

  /** Deterministic √-temperature mixture sample — the corpus-mixing
    * law LLM pipelines use to keep a head domain from drowning the
    * tail (temperature α = 0.5 flattening of the source distribution):
    * target per-source counts m_s ∝ √n_s scaled to an overall budget
    * of ⌊frac·N⌋ rows, realized as per-source Bernoulli keep rates
    * p_s = min(1, m_s/n_s) over the salted content-hash law. Unlike
    * [[weightedBernoulli]] the rates are DERIVED from the live corpus
    * statistics, not supplied per row — the operator is the policy.
    *
    * Cross-engine determinism: √n is quantized to an integer
    * sq_s = ⌊√n_s · 10⁶⌋ per source, so the normalizer S = Σ sq_s is
    * an ORDER-FREE integer sum (a raw Σ√n double fold would depend on
    * aggregation order and diverge between engines); the remaining
    * arithmetic (B·sq_s)/(S·n_s) runs on integer-valued doubles in a
    * fixed operand order, and the per-row decision is the usual
    * integer compare hash60 % Denom < ⌊p_s·Denom⌋ — no per-row float.
    * α is fixed at 0.5 because IEEE sqrt is correctly rounded on both
    * engines while pow(x, α) is not.
    *
    * Shape at 100 TB: one count-by-source aggregate (metadata-sized —
    * sources number in the thousands at most), broadcast back as
    * thresholds, then a scan-level filter. No shuffle of the corpus.
    */
  def temperatureMixture(df: DataFrame, srcCol: String, idCol: String,
                         frac: Double, salt: String): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val reserved = Seq("_src", "_n", "_sq", "_tot", "_sqs", "_thr")
    require(reserved.forall(c => !df.columns.contains(c)),
      s"input must not contain reserved columns ${reserved.mkString(",")}")
    val stats = df.groupBy(col(srcCol).as("_src"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_sq",
        floor(sqrt(col("_n").cast("double")) * lit(1000000.0)).cast("long"))
    val tot = stats.agg(sum(col("_n")).as("_tot"), sum(col("_sq")).as("_sqs"))
    val thr = stats.crossJoin(broadcast(tot))
      .select(col("_src"),
        floor(least(lit(1.0),
          (floor(col("_tot").cast("double") * lit(frac)) * col("_sq").cast("double")) /
            (col("_sqs").cast("double") * col("_n").cast("double")))
          * lit(Denom.toDouble)).cast("long").as("_thr"))
    df.join(broadcast(thr), col(srcCol) === col("_src"))
      .filter(
        hash60(concat(lit(salt), col(idCol).cast("string"))) % Denom
          < col("_thr"))
      .drop("_src", "_thr")
  }

  /** UniMax budgeted mixture (Chung et al. 2023 — "UniMax: Fairer and
    * More Effective Language Sampling"): allocate a TOTAL row budget
    * across sources as uniformly as possible while capping every
    * source at `maxEpochs` passes over its data — the fairness rule
    * large multilingual/domain mixtures train with (√-temperature
    * still up-weights heads; UniMax gives every source an equal share
    * unless its cap binds, then water-fills the remainder over the
    * rest). Output: the input rows with an `epoch` column — source s
    * with allocation b_s emits ⌊b_s/n_s⌋ FULL epochs (0-indexed) plus
    * a partial epoch of (b_s mod n_s) rows chosen by salted-hash rank
    * (deterministic and partition-invariant — the groupSample
    * discipline; repetition is explicit in the epoch index).
    *
    * The allocation is an exact integer water-fill over the
    * metadata-sized per-source stats frame, never the corpus: with
    * capacities c_s = n_s·maxEpochs in ascending (capacity, source)
    * order, source i is CAPPED iff c_i·(S−i+1) + prefix_cap(i−1) ≤ B —
    * ascending capacities make that per-row test prefix-closed (for
    * j < i: prefix(j−1) + c_j(i−j) ≤ prefix(i−1) term-by-term, so j's
    * test follows from i's), which is what lets every engine evaluate
    * it independently per row with no sequential scan. The uncapped
    * sources split the remaining budget by integer division, the
    * first (rem mod r) of them in the same total order taking one
    * extra row. Pure integer arithmetic end to end — cross-engine
    * exact.
    *
    * Shape at 100 TB: aggregates + windows over #sources rows, one
    * broadcast join of the allocations, one per-source rank window
    * (the corpus's single exchange), and an explode bounded by
    * maxEpochs + 1.
    */
  def unimaxMixture(df: DataFrame, srcCol: String, idCol: String,
                    budget: Long, maxEpochs: Int, salt: String): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(maxEpochs > 0, s"maxEpochs must be > 0, got $maxEpochs")
    val reserved = Seq("_src", "_n", "_cap", "_pfx", "_i", "_S",
      "_capped", "_capsum", "_ncap", "_bgt", "_rk", "_cnt", "epoch")
    require(reserved.forall(c => !df.columns.contains(c)),
      s"input must not contain reserved columns ${reserved.mkString(",")}")
    val ordW = org.apache.spark.sql.expressions.Window
      .orderBy(col("_cap"), col("_src"))
    // one row per source — the single-partition window is over a
    // metadata-sized frame by contract (sources number in the
    // thousands at most), the same trade the mixture samplers make
    val stats = df.groupBy(col(srcCol).as("_src"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_cap", col("_n") * maxEpochs)
      .withColumn("_i", row_number().over(ordW).cast("long"))
      .withColumn("_pfx", coalesce(sum(col("_cap")).over(
        ordW.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
    val total = stats.agg(count(lit(1)).as("_S"))
    val flagged = stats.crossJoin(broadcast(total))
      .withColumn("_capped",
        col("_cap") * (col("_S") - col("_i") + lit(1L)) + col("_pfx")
          <= budget)
    val aggs = flagged.agg(
      coalesce(sum(when(col("_capped"), col("_cap"))), lit(0L))
        .as("_capsum"),
      coalesce(sum(when(col("_capped"), lit(1L))), lit(0L)).as("_ncap"))
    val alloc = flagged.crossJoin(broadcast(aggs))
      .withColumn("_bgt", when(col("_capped"), col("_cap")).otherwise(
        expr(s"(${budget}L - _capsum) div (_S - _ncap)") +
          when(col("_i") - col("_ncap") <=
            expr(s"(${budget}L - _capsum) % (_S - _ncap)"), lit(1L))
            .otherwise(lit(0L))))
      .select(col("_src"), col("_n"), col("_bgt"))
    df.withColumn("_rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(srcCol))
          .orderBy(
            md5(concat(lit(salt), col(idCol).cast("string"))
              .cast("binary")),
            col(idCol))).cast("long"))
      .join(broadcast(alloc), col(srcCol) === col("_src"))
      .withColumn("_cnt", expr("_bgt div _n") +
        when(col("_rk") <= expr("_bgt % _n"), lit(1L)).otherwise(lit(0L)))
      .filter(col("_cnt") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_cnt") - 1)))
      .drop("_src", "_n", "_bgt", "_rk", "_cnt")
  }

  /** DSIR importance-based data selection (Xie et al. 2023,
    * arXiv:2302.03169 — Data Selection with Importance Resampling,
    * reduced to its hashed-n-gram law): estimate target and raw
    * distributions over HASHED token buckets, score every candidate
    * document by its summed per-token log importance ratio, and keep
    * the top `budget` — the public method between heuristic rules
    * (Gopher, q250) and model scoring for "select web data that looks
    * like the target corpus".
    *
    *  - features: hashed unigram buckets `hash60(token) % buckets`
    *    (the paper's hashed n-gram generative model, n=1 — the hash
    *    is the cross-engine md5 contract, no engine-native hashing);
    *  - bucket probabilities with add-1 smoothing; a bucket's
    *    log-importance is ONE `ln` of ONE exact-double rational —
    *    `llr_ppm = round(ln(((tc+1)·(R+B)) / ((rc+1)·(T+B)))·10⁶)`
    *    as a long (the [[graft.ext.LangModel]] fixed-point
    *    discipline: counts are exact, the products stay far under
    *    2⁵³, and both engines evaluate the identical expression
    *    shape);
    *  - a document's importance is the exact long SUM of its tokens'
    *    llr_ppm (the paper's product model in log space, token
    *    multiplicity included);
    *  - selection is deterministic top-`budget` by (importance desc,
    *    id asc) — Gumbel-free: the paper's Gumbel noise exists to
    *    de-duplicate near-identical web text, a job the dedup family
    *    owns in this engine, so selection here is the pure argmax.
    *
    * Shape at 100 TB: two token passes (one aggregate to the
    * `buckets`-sized stats frame with map-side combine, one scoring
    * pass joining the BROADCAST llr table), one shuffle on the doc id
    * for the per-doc sum, and a TakeOrderedAndProject for the top
    * budget (per-partition top-k, never a global sort).
    *
    * @param isTarget  rows of the TARGET distribution (never selected)
    * @param candidate rows eligible for selection (scored against the
    *                  raw distribution, which is the WHOLE input)
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: org.apache.spark.sql.Column,
                 candidate: org.apache.spark.sql.Column,
                 buckets: Int, budget: Int): DataFrame = {
    require(buckets > 0 && budget > 0,
      s"buckets ($buckets) and budget ($budget) must be > 0")
    val toks = docs.select(col(idCol).as("_ds_id"), isTarget.as("_ds_t"),
        candidate.as("_ds_c"),
        explode(TextHash.tokens(col(textCol))).as("_ds_tok"))
      .withColumn("_ds_b", hash60(col("_ds_tok")) % buckets)
    val stats = toks.groupBy(col("_ds_b")).agg(
      sum(when(col("_ds_t"), lit(1L)).otherwise(lit(0L))).as("_ds_tc"),
      count(lit(1)).as("_ds_rc"))
    val tot = stats.agg(sum(col("_ds_tc")).as("_ds_T"),
      sum(col("_ds_rc")).as("_ds_R"))
    val llr = stats.crossJoin(broadcast(tot))
      .withColumn("_ds_llr",
        round(log(
          ((col("_ds_tc") + lit(1.0)) *
            (col("_ds_R") + lit(buckets.toDouble))) /
          ((col("_ds_rc") + lit(1.0)) *
            (col("_ds_T") + lit(buckets.toDouble)))) * lit(1e6))
          .cast("long"))
      .select(col("_ds_b"), col("_ds_llr"))
    toks.filter(col("_ds_c"))
      .join(broadcast(llr), Seq("_ds_b"))
      .groupBy(col("_ds_id"))
      .agg(sum(col("_ds_llr")).as("importance_ppm"))
      .orderBy(col("importance_ppm").desc, col("_ds_id"))
      .limit(budget)
      .select(col("_ds_id").as(idCol), col("importance_ppm"))
  }

  /** Deterministic FIXED-QUOTA per-group sample — exactly
    * `min(k, |group|)` rows per group, chosen by ranking the group on a
    * salted content hash (the distributed, reproducible analogue of a
    * per-group reservoir): the keep/drop decision depends only on
    * (salt, id) and the group's membership, never on row order or
    * partitioning, so reruns and engine changes agree row-for-row. The
    * Bernoulli sampler above gives an EXPECTED rate; this gives an exact
    * count — what balanced corpus mixing ("at most k docs per source")
    * actually requires.
    *
    * Shape at 100 TB: one hash projection (no shuffle) + one window
    * rank (one exchange on the group key). The md5 rank key is
    * uniformly distributed, so the sort under the window is over hash
    * values — no value-skew pathologies; group-size skew itself is
    * AQE's standard skewed-partition case.
    */
  def groupSample(df: DataFrame, groupCol: String, idCol: String,
                  k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string")).cast("binary")),
        col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** EXACT-QUOTA stratified holdout split: within each stratum, rank
    * rows on the salted content hash and label the first
    * ⌊n_s · frac⌋ "val", the rest "train" — exactly that many, per
    * stratum, every run. [[hashSplit]] gives proportions only in
    * EXPECTATION (a small stratum can land a 14% holdout from a 10%
    * cut); evaluation sets need exact counts, and rerun-stable
    * membership (the salt+hash order, not row order, decides).
    *
    * frac is rounded to basis points ONCE on the driver; the quota is
    * then pure integer arithmetic ((n·bp) div 10⁴), so no
    * float-rounding boundary can flip a row cross-engine.
    *
    * Scale: the per-stratum rank uses [[Interleave.bucketedGroupRank]]
    * — the hash key is uniform, so bucketing it yields balanced
    * buckets and NO per-stratum single-machine sort (the window-rank
    * form would sort a 20-TB stratum on one task); stratum sizes are a
    * metadata aggregate broadcast back.
    */
  def exactQuotaSplit(df: DataFrame, idCol: String, strataCol: String,
                      valFrac: Double, salt: String): DataFrame = {
    require(valFrac >= 0.0 && valFrac <= 1.0,
      s"valFrac must be in [0,1], got $valFrac")
    val reserved = Seq("_eq_h", "_eq_r", "_eq_n", "split")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"exactQuotaSplit reserves column name(s) ${clash.mkString(", ")}; " +
        "rename them on the input")
    val bp = math.round(valFrac * Denom)
    val withH = df.withColumn("_eq_h",
      hash60(concat(lit(salt), col(idCol).cast("string"))))
    val ranked = Interleave.bucketedGroupRank(withH, Seq(strataCol),
      col("_eq_h"), 1L << 48, Seq(col("_eq_h"), col(idCol)), "_eq_r")
    val sizes = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_eq_n"))
    ranked.join(broadcast(sizes), Seq(strataCol))
      .withColumn("split",
        when(col("_eq_r") <= expr(s"(_eq_n * $bp) div $Denom"), lit("val"))
          .otherwise(lit("train")))
      .drop("_eq_h", "_eq_r", "_eq_n")
  }
}
