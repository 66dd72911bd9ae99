package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the table-diff audit step of an
  * incremental pipeline: given two snapshots of the same keyed table,
  * emit exactly what changed (added / removed / changed rows), the
  * check a data platform runs after every backfill or engine migration
  * to prove the new output equals the old one except where intended
  * (the reference's implicit contract every time it re-runs a loader
  * over an existing MySQL table, `details.py:277–281` — it only ever
  * *skips* matched keys; this operator says what the re-run would have
  * changed).
  *
  * Shape at 100 TB: ONE full-outer sort-merge join on the key — both
  * sides shuffle once on the key columns, which is the information-
  * theoretic minimum for an exact diff of two unaligned tables. If the
  * snapshots share a bucketed layout on the key (Sinks.writeBucketed),
  * the exchange disappears entirely (q56's exchange-free join law).
  * Column comparison is per-row null-safe equality (`<=>`), codegen'd,
  * no hashing/serialization detour — and no driver materialization.
  */
object Diff {

  /** Reserved output column names the inputs must not collide with. */
  private val Reserved = Seq("change", "_old_present", "_new_present")

  /** Diff `newDf` against `oldDf` by `keys`, comparing `compareCols`.
    *
    * Output: key columns, `change` ∈ ('added' | 'removed' | 'changed'),
    * plus `old_<c>` / `new_<c>` for every compared column. Unchanged
    * rows are dropped — at 100 TB the diff of two adjacent snapshots is
    * ~the delta size, so the output stays proportional to the change,
    * never to the table.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(compareCols.nonEmpty, "at least one compare column required")
    val inCols = (keys ++ compareCols)
    for (df <- Seq(oldDf, newDf); r <- Reserved)
      require(!df.columns.contains(r), s"input must not contain column $r")
    for (c <- inCols) {
      require(oldDf.columns.contains(c), s"old snapshot missing column $c")
      require(newDf.columns.contains(c), s"new snapshot missing column $c")
    }

    val o = oldDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c"))
        :+ lit(true).as("_old_present"): _*)
    val n = newDf.select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c"))
        :+ lit(true).as("_new_present"): _*)

    val joined = o.join(n, keys, "full_outer")
    val differs: Column = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    val change = when(col("_old_present").isNull, "added")
      .when(col("_new_present").isNull, "removed")
      .when(differs, "changed")

    joined
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ Seq(col("change"))
        ++ compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
