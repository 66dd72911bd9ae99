package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — the time-series lookups Spark's built-in join set lacks
  * (DuckDB/kdb/Pandas `ASOF JOIN`, pandas `merge_asof(direction=…)`):
  * for every left row, attach the single right row with
  *
  *  - BACKWARD: the greatest right timestamp ≤ the left timestamp
  *    (event→latest-prior-state attribution: purchase→last click,
  *    trade→last quote, reading→last calibration);
  *  - FORWARD: the smallest right timestamp ≥ the left timestamp
  *    (event→next-response attribution: impression→next conversion,
  *    alert→next acknowledgement, order→next fill);
  *
  * within the same key.
  *
  * Implementation is the union-sort shape, NOT a range join: tag both
  * sides, union, and run ONE analytic window per key ordered by
  * (timestamp, side) carrying the nearest right-side payload across.
  * Cost is a single shuffle on the key plus a per-key sort — the same
  * exchange a groupBy would pay — versus a ts-inequality join, which
  * Catalyst can only execute as a per-key cartesian filter (O(L·R) per
  * key). Skewed keys are one sort partition's problem (AQE-sized);
  * state per row is one payload struct, so the plan survives any scale
  * the sort does.
  *
  * Determinism: ties on the timestamp sort resolve via (side, then the
  * payload struct itself) — in BOTH directions equal-ts right rows
  * resolve to the struct-GREATEST payload, and a right row AT the left
  * timestamp is visible to it (inclusive, matching DuckDB
  * `ON l.ts >= r.ts` / `ON l.ts <= r.ts`).
  */
object AsOf {

  /** Backward as-of join (latest right row at-or-before the left
    * timestamp).
    *
    * @param payload right-side columns to carry (rightTs rides along
    *                automatically); emitted as `prefix + name`. Nullable
    *                payload columns are safe: the carried value is the
    *                whole row STRUCT, so a null field never falls back to
    *                an older row's value.
    * @param toleranceUs optional max staleness in microseconds (pandas
    *                `merge_asof(tolerance=…)` / kdb window-join): a
    *                matched right row older than `leftTs − tolerance` is
    *                reported as no-match. Applied AFTER the carry — a
    *                filter on the result columns, so the plan shape is
    *                unchanged.
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   prefix: String = "asof_",
                   toleranceUs: Option[Long] = None): DataFrame =
    joinImpl(left, right, keys, leftTs, rightTs, payload, prefix,
      toleranceUs, forward = false)

  /** Forward as-of join (earliest right row at-or-after the left
    * timestamp) — the other half of attribution pipelines: "what
    * happened NEXT". Same parameters, same union+window plan; only the
    * frame direction and the tolerance sign flip.
    */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, payload: Seq[String],
                  prefix: String = "asof_",
                  toleranceUs: Option[Long] = None): DataFrame =
    joinImpl(left, right, keys, leftTs, rightTs, payload, prefix,
      toleranceUs, forward = true)

  private def joinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String, payload: Seq[String],
                       prefix: String, toleranceUs: Option[Long],
                       forward: Boolean): DataFrame = {
    val carried = (rightTs +: payload.filterNot(_ == rightTs)).distinct
    // loud contract, not silent clobbering: the four internal working
    // columns are reserved, and a prefixed output name may not shadow a
    // left column
    val internal = Seq("_ts", "_side", "_p", "_asof")
    val reserved = (left.columns ++ right.columns).filter(internal.contains)
    require(reserved.isEmpty,
      s"as-of join reserves column name(s) ${reserved.mkString(", ")}; " +
        "rename them on the input")
    val shadowed = carried.map(prefix + _).filter(left.columns.contains)
    require(shadowed.isEmpty,
      s"asof output column(s) ${shadowed.mkString(", ")} would shadow " +
        "left columns — pass a different prefix")
    // Side ordering makes the inclusive bound work in each direction:
    // backward looks over (…, currentRow] so right rows (side 0) sort
    // BEFORE left (side 1) at equal ts; forward looks over
    // [currentRow, …) so left (side 0) sorts before right (side 1).
    val (lSide, rSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(lSide))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(rSide).as("_side"),
        struct(carried.map(col): _*).as("_p")): _*)
    // Equal-ts ties resolve to the struct-greatest payload in BOTH
    // directions: backward takes the LAST over ascending _p, forward
    // the FIRST over descending _p.
    val base = Window.partitionBy(keys.map(col): _*)
    val w =
      if (forward)
        base.orderBy(col("_ts"), col("_side"), col("_p").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        base.orderBy(col("_ts"), col("_side"), col("_p"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick =
      if (forward) first(col("_p"), ignoreNulls = true).over(w)
      else last(col("_p"), ignoreNulls = true).over(w)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof", pick)
      .filter(col("_side") === lSide)
    val bounded = toleranceUs.fold(matched) { tol =>
      val gap =
        if (forward)
          unix_micros(col(s"_asof.$rightTs")) - unix_micros(col("_ts"))
        else
          unix_micros(col("_ts")) - unix_micros(col(s"_asof.$rightTs"))
      matched.withColumn("_asof", when(gap <= tol, col("_asof")))
    }
    bounded.select(left.columns.toSeq.map(col) ++
      carried.map(c => col(s"_asof.$c").as(s"$prefix$c")): _*)
  }

  /** Nearest-in-time as-of join — backward and forward composed:
    * each left row takes whichever qualifying right row is CLOSER in
    * time, the backward match winning exact-distance ties (the
    * "attribute to what already happened" convention). Within each
    * direction the tie law is the directional joins' own
    * (struct-greatest payload at equal timestamps), so this operator
    * inherits their determinism wholesale.
    *
    * Needs `idCol`, a UNIQUE left row id (caller contract — e.g. an
    * event id): the two directional passes run over the same left
    * frame and re-meet on it. Shape at 100 TB: two union+window
    * passes (each one exchange on `keys`) plus one equi-join on the
    * id — still no range explosion, still no cartesian.
    */
  def joinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  idCol: String, leftTs: String, rightTs: String,
                  payload: Seq[String], prefix: String = "asof_",
                  toleranceUs: Option[Long] = None): DataFrame = {
    val carried = (rightTs +: payload.filterNot(_ == rightTs)).distinct
    val b = joinBackward(left, right, keys, leftTs, rightTs, payload,
      "_nb_", toleranceUs)
    val f = joinForward(left, right, keys, leftTs, rightTs, payload,
      "_nf_", toleranceUs)
      .select((idCol +: carried.map(c => s"_nf_$c")).map(col): _*)
    val gapB = unix_micros(col(leftTs)) - unix_micros(col(s"_nb_$rightTs"))
    val gapF = unix_micros(col(s"_nf_$rightTs")) - unix_micros(col(leftTs))
    val useB = col(s"_nb_$rightTs").isNotNull &&
      (col(s"_nf_$rightTs").isNull || gapB <= gapF)
    b.join(f, Seq(idCol))
      .select(left.columns.toSeq.map(col) ++
        carried.map(c =>
          when(useB, col(s"_nb_$c")).otherwise(col(s"_nf_$c"))
            .as(s"$prefix$c")): _*)
  }
}
