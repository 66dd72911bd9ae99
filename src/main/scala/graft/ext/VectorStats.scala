package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-dimension feature standardization (z-scores) over an embedding
  * column — the normalization pass ANN / clustering pipelines run
  * before distance computations so no dimension dominates by scale
  * (and the preprocessing twin of the q43/q74 quantizer: same flat
  * (vec, dim) shape, same exact-integer moment discipline).
  *
  * Determinism contract (the q43 quantized-sum law, extended to second
  * moments): every value quantizes to an exact integer q = round(x·10⁶);
  * per-dimension moments (n, Σq, Σq²) are exact integer aggregates —
  * order-independent, so partitioning can never change them — and the
  * z-score is computed from the single closed form
  *
  *   z = (q·n − Σq) / √(n·Σq² − (Σq)²)
  *
  * whose numerator and radicand are EXACT integers: one IEEE divide,
  * one IEEE sqrt, one multiply, one round — both engines must disagree
  * within 10⁻¹⁰ of a rounding boundary to diverge (q61 argument).
  *
  * Shape at 100 TB: posexplode (narrow) → one combinable aggregation
  * whose output is |dims| rows → broadcast join back → narrow
  * projection. ONE shuffle of (dim, q) partials total; the per-dim
  * moment state is 3 numbers, so a billion vectors aggregate into
  * |dims| rows of state regardless of corpus size.
  */
object VectorStats {

  /** Flat per-(vector, dimension) z-scores in exact ppm.
    * Output: vec_id, dim (0-based), q (the quantized value), z_ppm
    * (null for a zero-variance dimension).
    */
  def standardizePpm(emb: DataFrame, idCol: String,
                     vecCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val q = emb.select(col(idCol).as("vec_id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        round(col("x").cast("double") * 1e6).cast("long").as("q"))
      // feeds the moment aggregate AND the z projection — one
      // materialization, one explode pass (the q61 discipline)
      .localCheckpoint()
    val stats = q.groupBy("dim").agg(
      count(lit(1)).as("n"),
      sum(col("q").cast(dec)).as("s1"),
      sum((col("q") * col("q")).cast(dec)).as("s2"))
    val num = (col("q").cast(dec) * col("n") - col("s1")).cast("double")
    val rad = (col("n") * col("s2") - col("s1") * col("s1")).cast("double")
    q.join(broadcast(stats), "dim")
      .withColumn("z_ppm",
        when(rad > 0.0,
          round(num / sqrt(rad) * 1e6).cast("long")))
      .select("vec_id", "dim", "q", "z_ppm")
  }

  /** Uniform per-dimension scalar quantization to `levels` integer
    * codes (levels=256 → int8 storage): code = ⌊(x − min_d) · levels /
    * (max_d − min_d)⌋ clamped to levels−1, per dimension d. THE
    * storage-layer operator of a 100-TB embedding corpus — 4× smaller
    * than float32 on the wire and at rest, with reconstruction error
    * bounded by one quantization step (spec-pinned); the ANN recall
    * cost of int8 is the industry-standard trade.
    *
    * Scale shape: one partial-aggregable per-dimension min/max (output
    * = dims rows, broadcast back) + a scan-level projection — the
    * corpus never shuffles.
    *
    * Determinism: float32 inputs widen to double EXACTLY; min/max pick
    * among exactly-representable values; the (x−mn)·levels/(mx−mn)
    * chain is one fixed IEEE-754 double sequence both engines execute
    * identically, and ⌊·⌋ of an identical double is identical — the
    * q43/q74 determinism contract. A degenerate dimension (mx = mn)
    * codes to 0.
    */
  def quantizeUniform(emb: DataFrame, idCol: String, vecCol: String,
                      levels: Int): DataFrame = {
    require(levels >= 2, s"levels must be >= 2, got $levels")
    val e = emb.select(col(idCol).as("vec_id"),
        posexplode(col(vecCol)).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
      .localCheckpoint() // feeds the min/max aggregate AND the projection
    val mm = e.groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    e.join(broadcast(mm), "dim")
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(lit(levels - 1),
            floor((col("x") - col("mn")) * lit(levels.toDouble)
              / (col("mx") - col("mn")))).cast("int")))
      .select("vec_id", "dim", "code")
  }
}
