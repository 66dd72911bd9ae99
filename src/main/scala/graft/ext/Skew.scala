package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextHash.hash60

/** Hot-key salting — the join-skew mitigation AQE's skew-join handling
  * generalizes, expressed as an explicit operator so a pipeline can
  * apply it where runtime stats aren't available (first run, streaming,
  * or a deliberately pinned plan). A handful of hot keys (the Zipf head
  * of a 100 TB corpus: the top domain, the null-ish placeholder id, the
  * one viral document) otherwise collapse a shuffle join into a single
  * straggler task.
  *
  * Mechanics — exact, not approximate: the result is row-for-row the
  * plain inner join.
  *   - hot keys are DETECTED declaratively (a count aggregate over the
  *     build side's key column, thresholded) — a tiny frame that
  *     broadcasts; nothing collects to the driver;
  *   - left rows with a hot key fan their salt from a deterministic
  *     hash of a caller-named disambiguator column (no RNG — the same
  *     row always lands in the same salt bucket, so reruns are
  *     identical); cold rows take salt 0;
  *   - right rows with a hot key REPLICATE across all `salts` buckets
  *     (explode over a sequence); cold rows emit once with salt 0;
  *   - the join key becomes (key, salt): each hot key's rows now spread
  *     over `salts` shuffle partitions instead of one.
  *
  * Cost: the replicated right rows are `salts × hot-right-rows` — by
  * construction a join of the Zipf HEAD, so the blow-up is bounded and
  * chosen (`salts`), unlike the unbounded straggler it removes.
  */
object Skew {

  /** Inner equi-join of `left` and `right` on `key`, salted for the
    * keys whose LEFT-side multiplicity is at least `hotThreshold`.
    *
    * @param saltFrom a left column whose hash spreads a hot key's rows
    *                 across salt buckets (any well-distributed column —
    *                 a PK, a timestamp; constant values degrade to the
    *                 unsalted plan, they do not break correctness)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFrom: String, salts: Int, hotThreshold: Long): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // loud contract, not silent clobbering (same guard as AsOf): the
    // three internal working columns are reserved
    val internal = Seq("_hot_n", "_hot", "_salt")
    val reserved = (left.columns ++ right.columns).filter(internal.contains)
    require(reserved.isEmpty,
      s"saltedJoin reserves column name(s) ${reserved.distinct.mkString(", ")}; " +
        "rename them on the input")
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("_hot_n"))
      .filter(col("_hot_n") >= hotThreshold)
      .select(col(key), lit(true).as("_hot"))
    val l = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt",
        when(col("_hot"), saltCol(col(saltFrom), salts)).otherwise(lit(0)))
      .drop("_hot")
    val r = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("_salt",
        explode(sequence(lit(0),
          when(col("_hot"), lit(salts - 1)).otherwise(lit(0)))))
      .drop("_hot")
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** The salt expression alone, for aggregation salting: two-phase
    * `groupBy(key, salt).agg(partials) → groupBy(key).agg(merge)` —
    * callers that aggregate (rather than join) on a skewed key only
    * need the column. A NULL disambiguator salts to bucket 0 — it must
    * never null the join key and silently drop the row.
    */
  def saltCol(saltFrom: Column, salts: Int): Column =
    coalesce(
      pmod(hash60(saltFrom.cast("string")), lit(salts.toLong)).cast("int"),
      lit(0))
}
