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

  /** ROW-LOCAL count-min screen: append each row's sketch estimate for
    * its term WITHOUT shuffling the rows — `depth` broadcast hash
    * joins against the (≤ depth·width)-row sketch, then `least()`
    * across the per-row cell counts. This is the piece that makes the
    * sketch a SHUFFLE GATE rather than just a summary: at 100 TB,
    * exact heavy-hitter counting via plain groupBy shuffles every junk
    * singleton in a billion-term vocabulary; screening first means the
    * exact aggregation's exchange carries ONLY rows whose estimate
    * clears the threshold — and since CMS only ever overcounts, no
    * true heavy hitter is lost (no-false-negative theorem). The tail
    * never shuffles; the survivors' exact counts are complete because
    * every occurrence of a term screens identically.
    *
    * Pass a MATERIALIZED sketch (localCheckpoint / written artifact):
    * each of the `depth` broadcast joins otherwise re-derives the full
    * sketch aggregation from lineage, multiplying the build cost by
    * depth (measured 13× on the q140 corpus).
    */
  def screenEstimate(rows: DataFrame, termCol: String, cms: DataFrame,
                     depth: Int, width: Int, out: String): DataFrame = {
    require(depth > 0 && width > 0, s"need depth/width > 0, got $depth/$width")
    val internal = (0 until depth)
      .flatMap(j => Seq(s"_cms_pos_$j", s"_cms_cnt_$j"))
    val reserved = rows.columns.filter(c => internal.contains(c) || c == out)
    require(reserved.isEmpty,
      s"screenEstimate reserves column name(s) ${reserved.mkString(", ")}; " +
        "rename them on the input")
    var acc = rows
    val ests = (0 until depth).map { j =>
      val cmsJ = cms.filter(col("row") === j)
        .select(col("pos").as(s"_cms_pos_$j"), col("cnt").as(s"_cms_cnt_$j"))
      acc = acc.join(broadcast(cmsJ),
        cmsPos(col(termCol), j, width) === col(s"_cms_pos_$j"), "left")
      // absent cell = never inserted = estimate 0 (see estimateMin)
      coalesce(col(s"_cms_cnt_$j"), lit(0L))
    }
    acc.withColumn(out, least(ests: _*)).drop(internal: _*)
  }

  /** HyperLogLog register build — the CARDINALITY member of the sketch
    * family (count-min = frequency, approx_percentile = quantiles).
    * This materializes the sketch STATE, not a float estimate: per
    * group, `buckets` registers where register[b] = max over keys
    * hashing to b of (1 + leading zero count of the key's remaining
    * hash bits) — the Flajolet HLL observable. The estimate
    * (α·m²/Σ2^−reg) is one harmonic fold away and engine-local;
    * registers are the part that must be exact, portable, and
    * MERGEABLE: union of two sketches = element-wise max, which is why
    * register tables — not estimates — are what a 100 TB pipeline
    * stores per partition/day and folds at query time.
    *
    * Why at 100 TB: like the CMS, the aggregation is
    * partial-aggregable with output bounded by groups × buckets, not
    * by key cardinality — each input partition collapses to ≤
    * |groups|·`buckets` rows before the exchange, so counting a
    * billion distinct users shuffles kilobytes.
    *
    * Determinism: the hash is the md5-60 contract; the leading-zero
    * count is integer via binary-string length (`bin()` has identical
    * no-leading-zeros semantics in Spark and DuckDB) — no log2 IEEE
    * boundary risk. Empty buckets are OMITTED (both engines agree);
    * readers treat absent registers as 0.
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
                   buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 && buckets <= 4096,
      s"buckets must be a power of two in [1,4096], got $buckets")
    val bucketBits = java.lang.Integer.numberOfTrailingZeros(buckets)
    val wBits = 60 - bucketBits // hash60 bits left above the bucket index
    val h = TextHash.hash60(
      concat(lit("hll_"), col(keyCol).cast("string")))
    df.select(col(groupCol).as("grp"), h.as("h"))
      .select(col("grp"), (col("h") % buckets).cast("int").as("bucket"),
        expr(s"h div $buckets").as("w"))
      .select(col("grp"), col("bucket"),
        when(col("w") === 0, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("w"))))
          .cast("int").as("rho"))
      .groupBy(col("grp").as(groupCol), col("bucket"))
      .agg(max(col("rho")).as("register"))
  }
}
