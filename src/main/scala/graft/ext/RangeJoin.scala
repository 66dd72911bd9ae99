package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi key — the one join family in
  * SURVEY.md §2.3 not yet exercised by the query pack (semi/anti/as-of
  * are covered; the reference itself, a point-lookup ETL, has none).
  *
  * Problem shape: points p ⋈ intervals [lo, hi) on `lo <= p < hi` with
  * NO shared key. Catalyst can only plan a raw inequality join as
  * BroadcastNestedLoopJoin (fine when one side is tiny, fatal when both
  * sides are large: all-pairs work). The scale path is BINNING: quantize
  * the domain into fixed-width bins, explode each interval into the bins
  * it covers, tag each point with its single bin, equi-join on the bin,
  * and re-check the exact bounds. Every candidate comes from a
  * bounded-occupancy equi-join — the same discipline as the LSH/band
  * joins in Dedup/Similarity, and the same plan Flink/Databricks use for
  * their range-join hints.
  *
  * Sizing at scale: an interval of length L produces ⌈L/binWidth⌉+1
  * join rows, a point exactly one — choose binWidth ≈ the typical
  * interval length so the fan-out is O(1) per interval. Candidate volume
  * per bin = points-in-bin × intervals-covering-bin; a bursty bin is a
  * skewed join key and AQE's skew-join split applies (or salt the bin
  * key with ext/Skew for a known-degenerate domain). Each (point,
  * interval) candidate arises at most ONCE (the point has exactly one
  * bin), so no post-join dedup is needed.
  */
object RangeJoin {

  private val BinCol = "_graft_bin"

  /** Join `points` to every interval of `intervals` containing the point:
    * emits one row per (point, interval) with `lo <= point < hi`,
    * carrying all columns of both inputs.
    *
    * Contract: `pointCol`/`loCol`/`hiCol` are integral (LongType-coercible)
    * columns on a NON-NEGATIVE domain (epoch micros, char offsets, …) —
    * SQL `div` truncates toward zero, which equals the floor division the
    * binning law needs only for non-negative operands. Empty or inverted
    * intervals (lo >= hi) match nothing. Column names of the two inputs
    * must be disjoint (the join carries both sides verbatim).
    */
  def binnedIntervalJoin(points: DataFrame, pointCol: String,
                         intervals: DataFrame, loCol: String, hiCol: String,
                         binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points/intervals column names must be disjoint; shared: $shared")
    require(!(points.columns ++ intervals.columns).contains(BinCol),
      s"$BinCol is reserved by binnedIntervalJoin")

    val p = points.withColumn(BinCol, expr(s"`$pointCol` div ${binWidth}L"))
    // hi is exclusive → the last covered bin is the one holding hi-1.
    val i = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn(BinCol, explode(sequence(
        expr(s"`$loCol` div ${binWidth}L"),
        expr(s"(`$hiCol` - 1L) div ${binWidth}L"))))
    p.join(i, BinCol)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(BinCol)
  }

  /** Interval × interval OVERLAP join — emits one row per pair of
    * half-open intervals with `lLo < rHi AND rLo < lHi` (the shape
    * behind "which sessions were active during which incidents").
    * Both sides explode into their covered bins and equi-join on the
    * bin; since an overlapping pair can share MANY bins, the pair is
    * kept only in its FIRST shared bin — `bin == max(lLo, rLo) div
    * binWidth`, which for overlapping intervals both sides provably
    * cover — so each pair arises exactly once WITHOUT a distinct
    * (dedup would re-shuffle the whole candidate set; the first-bin
    * guard is a free map-side filter). Same non-negative-domain and
    * disjoint-column contract as [[binnedIntervalJoin]]; fan-out per
    * interval is ⌈L/binWidth⌉+1, so size binWidth ≈ typical interval
    * length.
    */
  def binnedOverlapJoin(left: DataFrame, lLo: String, lHi: String,
                        right: DataFrame, rLo: String, rHi: String,
                        binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left/right column names must be disjoint; shared: $shared")
    require(!(left.columns ++ right.columns).contains(BinCol),
      s"$BinCol is reserved by binnedOverlapJoin")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) < col(hi))
      .withColumn(BinCol, explode(sequence(
        expr(s"`$lo` div ${binWidth}L"),
        expr(s"(`$hi` - 1L) div ${binWidth}L"))))
    binned(left, lLo, lHi).join(binned(right, rLo, rHi), BinCol)
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col(BinCol) === expr(s"greatest(`$lLo`, `$rLo`) div ${binWidth}L"))
      .drop(BinCol)
  }
}
