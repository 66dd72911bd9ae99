package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted interleaving — the reading ORDER a trainer
  * consumes a mixed corpus in. q135 (√-temperature mixture) decides
  * WHICH documents survive per source; this operator decides their
  * global sequence, spacing each source's documents evenly ∝ weight
  * (stride scheduling, Waldspurger & Weihl OSDI '94): a source with
  * weight w receives every L/w-th slot, so ANY contiguous training
  * window — not just the epoch as a whole — sees the target mixture.
  * Shuffling alone gives that only in expectation; the stride law gives
  * it deterministically, rerun-stable, with no RNG anywhere.
  *
  * Law: within its source (ordered by id), document number r (0-based)
  * gets virtual time vt = (2r+1)·(L/w_s), L = lcm of all weights
  * (midpoint rule — sources never all collide at t=0); the global order
  * is (vt, source, id) — a total order, integer-exact in any engine.
  *
  * Scale design — the naive form is two windows: `row_number PARTITION
  * BY source` (one single-machine sort PER SOURCE — with 5 sources,
  * 5 tasks sort 20 TB each) and `row_number` over the whole corpus
  * (ONE task sorts everything). Both are replaced by
  * [[bucketedGroupRank]]: bucket the order key, count rows per
  * (group, bucket) — a metadata-sized table — prefix-sum those counts
  * per group, and rank only WITHIN (group, bucket), so parallelism is
  * #buckets regardless of group count, and no task ever sorts more
  * than one bucket. Exactly the distributed-prefix-sum discipline of
  * q125's histogram selection, applied to rank assignment.
  */
object Interleave {

  /** Exact `row_number() OVER (PARTITION BY groupCols ORDER BY
    * orderCols)` (1-based, as `out`) computed WITHOUT a per-group
    * single-machine sort. `bucketOn` must be a non-negative integral
    * column that is a PREFIX of the order (rows in a lower bucket sort
    * strictly before a higher bucket within a group), and `orderCols`
    * must totally order rows within a (group, bucket); both hold for
    * the canonical call sites (bucket = id div width, order = id).
    *
    * Plan: one metadata-sized aggregate (#groups × #buckets rows), a
    * prefix-sum window over THAT (never over the data), and a
    * per-(group, bucket) local rank — max task sort = one bucket.
    *
    * SIZING LAW (measured in ScaleRank at 60M rows): the kernel is for
    * FEW-group and global ranking, where the window form collapses to
    * one sort task per group (global: 3× slower; 4 groups: 1.8×
    * slower than this kernel). Keep groups × buckets small enough that
    * the offsets table still BROADCASTS — widen `bucketWidth` as group
    * count grows (2^16-wide buckets at 4096 groups made a 26M-row
    * counts table and ran 8× slower than the window form; 2^24 restores
    * the plan). When the group count alone saturates the cluster,
    * per-group window sorts are already parallel — use the window.
    */
  def bucketedGroupRank(df: DataFrame, groupCols: Seq[String],
                        bucketOn: Column, bucketWidth: Long,
                        orderCols: Seq[Column], out: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    // loud contract, not silent clobbering (same guard as saltedJoin)
    val internal = Seq("_rk_key", "_rk_bucket", "_rk_cnt", "_rk_off")
    val reserved = df.columns.filter(c => internal.contains(c) || c == out)
    require(reserved.isEmpty,
      s"bucketedGroupRank reserves column name(s) ${reserved.mkString(", ")}; " +
        "rename them on the input")
    val g = groupCols.map(col)
    // `div`, not `/`: long/long `/` is IEEE double division, inexact
    // past 2^53 (same trap Tables.events documents)
    val withB = df.withColumn("_rk_key", bucketOn.cast("long"))
      .withColumn("_rk_bucket", expr(s"_rk_key div $bucketWidth"))
      .drop("_rk_key")
    val counts = withB.groupBy(g :+ col("_rk_bucket"): _*)
      .agg(count(lit(1)).as("_rk_cnt"))
    // prefix-sum over the COUNTS table only: #groups × #buckets rows,
    // so the unpartitioned window of the groupCols=Nil case is a
    // single task over metadata, never over data
    val w = Window.partitionBy(g: _*).orderBy(col("_rk_bucket"))
    val offsets = counts
      .withColumn("_rk_off", sum(col("_rk_cnt")).over(w) - col("_rk_cnt"))
      .drop("_rk_cnt")
    val local = Window.partitionBy(g :+ col("_rk_bucket"): _*)
      .orderBy(orderCols: _*)
    withB.join(offsets, groupCols :+ "_rk_bucket")
      .withColumn(out, col("_rk_off") + row_number().over(local))
      .drop("_rk_bucket", "_rk_off")
  }

  /** The stride-scheduled epoch order: every input row, with `seq`
    * (1-based global slot) and `vt` (the integer virtual time behind
    * it). `weights` must cover every group value (loud error
    * otherwise — a silently-unweighted source would starve); ids must
    * be non-negative and unique per group.
    */
  def strideOrder(df: DataFrame, idCol: String, groupCol: String,
                  weights: Map[String, Long],
                  bucketWidth: Long = 4096L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val taken = df.columns.filter(Set("vt", "seq", "_stride_r"))
    require(taken.isEmpty,
      s"strideOrder reserves column name(s) ${taken.mkString(", ")}; " +
        "rename them on the input")
    val lcm = weights.values.reduce((a, b) => a / gcd(a, b) * b)
    // per-group 0-based rank r, then vt = (2r+1)·(L/w)
    val ranked = bucketedGroupRank(df, Seq(groupCol), col(idCol),
      bucketWidth, Seq(col(idCol)), "_stride_r")
    val stride = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (k, v)) =>
        when(col(groupCol) === lit(k), lit(lcm / v)).otherwise(acc)
    }
    val timed = ranked
      .withColumn("vt", (lit(2L) * (col("_stride_r") - lit(1L)) + lit(1L)) *
        // unknown group value = a weight we never agreed to — fail the
        // job loudly rather than emit a silently-starved order
        coalesce(stride, raise_error(concat(
          lit("strideOrder: group value outside the weight map: "),
          col(groupCol))).cast("long")))
      .drop("_stride_r")
    bucketedGroupRank(timed, Nil, col("vt"), bucketWidth * weights.size,
      Seq(col("vt"), col(groupCol), col(idCol)), "seq")
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
}
