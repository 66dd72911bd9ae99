package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a term stream — the frequency half of the
  * sketch family (q65's approx_percentile covers quantiles, q01's
  * approx_count_distinct covers cardinality; this covers point
  * frequency / heavy hitters).
  *
  * Why at 100 TB: exact term counting shuffles the full (term, count)
  * vocabulary — web-scale corpora have billions of distinct terms, most
  * of them junk singletons. The CMS is a FIXED-size summary
  * (depth × width cells) built with one map-side-combinable
  * aggregation whose output is bounded by the sketch size, not the
  * vocabulary: partial aggregation collapses each input partition to
  * ≤ depth·width rows before the exchange, so the shuffle volume is
  * constant in corpus size. Estimates only ever OVERcount
  * (est ≥ exact; E[err] ≤ 2N/width per Cormode-Muthukrishnan), so
  * thresholded heavy-hitter screens have no false negatives — the same
  * prefilter-then-verify discipline as ext/Bloom.
  *
  * Determinism: row hashes are the md5-60 contract
  * (hash60("cms_<j>_" ++ term) mod width), so the sketch — and any
  * estimate read from it — is bit-identical across engines and
  * partitionings.
  */
object Sketches {

  /** Cell coordinates of `term` in hash row j. */
  private def cmsPos(term: Column, j: Int, width: Int): Column =
    pmod(TextHash.hash60(concat(lit(s"cms_${j}_"), term)), lit(width.toLong))
      .cast("int")

  /** Build the sketch: one row per non-empty cell, (row, pos, cnt).
    * Cells never touched stay absent (semantically zero — estimateMin
    * restores them via a left join). `weight` lets a pre-aggregated
    * vocabulary insert (term, n) pairs — identical sketch to inserting
    * n occurrences, with vocabulary-sized instead of corpus-sized input.
    */
  def countMin(terms: DataFrame, termCol: String, depth: Int, width: Int,
               weight: Column = lit(1L)): DataFrame = {
    require(depth > 0 && width > 0, s"need depth/width > 0, got $depth/$width")
    terms
      .select(weight.cast("long").as("_cms_w"),
        explode(array((0 until depth).map(j =>
          struct(lit(j).as("row"), cmsPos(col(termCol), j, width).as("pos"))): _*))
          .as("c"))
      .groupBy(col("c.row").as("row"), col("c.pos").as("pos"))
      .agg(sum(col("_cms_w")).as("cnt"))
  }

  /** Point-frequency estimates for `probes` from a built sketch:
    * est(term) = min over rows of the term's cell count, with absent
    * cells counting ZERO (a term that misses any cell was never
    * inserted) — hence the left join + coalesce, an inner join would
    * silently over-estimate uninserted terms by dropping their empty
    * cells from the min.
    */
  def estimateMin(cms: DataFrame, probes: DataFrame, termCol: String,
                  depth: Int, width: Int): DataFrame = {
    val cells = probes
      .withColumn("_cms_cell", explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"), cmsPos(col(termCol), j, width).as("pos"))): _*)))
      .select(probes.columns.map(col) :+ col("_cms_cell.row").as("row") :+
        col("_cms_cell.pos").as("pos"): _*)
    cells
      .join(cms, Seq("row", "pos"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }
}
