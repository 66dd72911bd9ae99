package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact distributed k-th smallest (median, any quantile) WITHOUT
  * sorting: iterative histogram refinement — the selection algorithm
  * a warehouse actually runs when "exact median of a 100 TB column"
  * is the requirement and `approx_percentile` (q65) isn't acceptable.
  *
  * Why not sort: an exact per-group sort (`row_number = k`) range-
  * shuffles EVERY row; one hot group becomes one hot machine-local
  * sort. Histogram selection never moves a row: each round is one
  * partial-aggregable COUNT per (group, bucket) over the scan —
  * shuffle volume = groups × B, constant in data size — and the
  * driver walks the cumulative counts to find which bucket holds the
  * k-th value, narrowing that group's [lo, hi] by ~B× per round. An
  * integer domain of width W resolves in ⌈log_B W⌉ rounds (ppm-scaled
  * doubles: W ≈ 10⁹, B = 1024 → 3 scans, fixed and data-independent).
  * Driver state is (lo, hi, k) per GROUP — bytes, not rows.
  *
  * Determinism: values are caller-quantized integers, bucket edges
  * are integer `div` arithmetic, counts are exact — every engine
  * agrees on "the k-th smallest value" (duplicates collapse to the
  * same value; the law needs no row tie-break).
  */
object Selection {

  /** Exact k-th smallest `valueCol` (integral) per group, where
    * k = `kOfN`(group row count) — e.g. lower median `n => (n+1)/2`.
    * Returns (groupCol, n, kth) rows computed via ≤ `maxRounds`
    * histogram scans; throws if the domain fails to resolve (cannot
    * happen for B ≥ 2 and bounded integer domains — the bound is a
    * runaway guard, not a tuning knob).
    */
  def exactKth(df: DataFrame, groupCol: String, valueCol: String,
               kOfN: Long => Long, buckets: Int = 1024,
               maxRounds: Int = 16): DataFrame =
    exactKths(df, groupCol, valueCol, Seq(kOfN), buckets, maxRounds)
      .select(col(groupCol), col("n"), col("kth"))

  /** MULTI-quantile generalization: every requested k-th value per
    * group resolves in the SAME ≤⌈log_B W⌉ counting scans — the
    * per-round histogram is keyed (group, quantile), built by
    * replicating each scanned row across the quantiles whose still-
    * open [lo, hi] window contains it (one broadcast join on the
    * group; resolved quantiles leave the bounds list, so replication
    * SHRINKS round over round). Shuffle volume per round is groups ×
    * open-quantiles × B — metadata. An equi-depth histogram's B−1
    * boundaries therefore cost the same scan count as one median, not
    * (B−1)× it.
    *
    * Returns (groupCol, q, n, kth) where q is the index into `ks`.
    */
  def exactKths(df: DataFrame, groupCol: String, valueCol: String,
                ks: Seq[Long => Long], buckets: Int = 1024,
                maxRounds: Int = 16): DataFrame =
    weightedKths(df.withColumn("_w1", lit(1L)), groupCol, valueCol,
      "_w1", ks, buckets, maxRounds)

  /** WEIGHTED multi-quantile selection: the k-th is the smallest value
    * whose cumulative WEIGHT reaches k = `kOfW`(group weight total) —
    * e.g. the character-weighted median document length ("50% of the
    * corpus bytes live in docs ≤ X chars"), or any importance-weighted
    * quantile a training mixture reasons with. Same histogram
    * refinement, counting `sum(weight)` per bucket instead of rows;
    * weights must be POSITIVE integers (a zero/negative weight makes
    * "the value at cumulative weight k" ill-defined — guarded).
    * Returns (groupCol, q, n, kth) where n is the group's total
    * weight.
    */
  def weightedKths(df: DataFrame, groupCol: String, valueCol: String,
                   weightCol: String, ks: Seq[Long => Long],
                   buckets: Int = 1024, maxRounds: Int = 16): DataFrame = {
    require(buckets >= 2, s"need ≥ 2 buckets, got $buckets")
    require(ks.nonEmpty, "need at least one quantile")
    val spark = df.sparkSession
    val base = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("long").as("v"),
      col(weightCol).cast("long").as("w"))
    // round 0: per-group weight total, weight-validity guards (NULL
    // weights first — min(w) skips NULLs, so without the explicit NULL
    // count a group mixing positive and null weights would pass the
    // positivity guard and its null-weight rows silently count as
    // weight 0, violating the loud-failure contract; an all-null group
    // would NPE on the min), value bounds
    val init = base.groupBy("g")
      .agg(sum("w").as("n"), min("v").as("lo"), max("v").as("hi"),
        min("w").as("_wmin"),
        sum(when(col("w").isNull, 1L).otherwise(0L)).as("_wnull"))
      .collect()
      .flatMap { r =>
        val g = r.getString(0)
        require(r.getLong(5) == 0L,
          s"weights must be positive integers (group $g has " +
            s"${r.getLong(5)} NULL-weight row(s))")
        val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
        require(r.getLong(4) >= 1L,
          s"weights must be positive integers (group $g has ${r.getLong(4)})")
        ks.zipWithIndex.map { case (kOfN, qi) =>
          val k = kOfN(n)
          require(k >= 1 && k <= n, s"kOfN($n) = $k outside [1, $n]")
          (g, qi) -> ((n, k, lo, hi))
        }
      }.toMap

    // state: (group, quantile) -> (n, k-within-[lo,hi], lo, hi)
    var state = init
    var rounds = 0
    while (state.values.exists { case (_, _, lo, hi) => lo < hi }) {
      require(rounds < maxRounds,
        s"selection failed to resolve in $maxRounds rounds — " +
          "non-integral or unbounded domain?")
      rounds += 1
      val open = state.toSeq.collect {
        case ((g, q), (_, _, lo, hi)) if lo < hi => (g, q, lo, hi)
      }
      val bounds = spark.createDataFrame(open).toDF("g", "q", "_lo", "_hi")
      // bucket width ≥ 1 via ceil((hi-lo+1)/B); values outside [lo,hi]
      // were excluded in an earlier round and are filtered out
      val hist = base
        .join(broadcast(bounds), Seq("g"))
        .filter(col("v") >= col("_lo") && col("v") <= col("_hi"))
        .withColumn("_bw",
          expr(s"(_hi - _lo + ${buckets}L) div ${buckets}L"))
        .withColumn("_b", expr("(v - _lo) div _bw"))
        .groupBy("g", "q", "_b").agg(sum("w").as("c"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .groupBy(t => (t._1, t._2))
      state = state.map { case (key @ (_, _), (n, k, lo, hi)) =>
        if (lo == hi) key -> ((n, k, lo, hi))
        else {
          val w = (hi - lo + buckets) / buckets
          val cum = hist(key).sortBy(_._3)
          var kk = k
          var picked = -1L
          for ((_, _, b, c) <- cum if picked < 0)
            if (kk <= c) picked = b else kk -= c
          val nlo = lo + picked * w
          val nhi = math.min(hi, lo + (picked + 1) * w - 1)
          key -> ((n, kk, nlo, nhi))
        }
      }
    }
    spark.createDataFrame(
        state.toSeq.map { case ((g, q), (n, _, lo, _)) => (g, q, n, lo) })
      .toDF(groupCol, "q", "n", "kth")
  }
}
