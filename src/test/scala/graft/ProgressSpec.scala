package graft

import org.apache.spark.sql.functions._
import graft.sources.Progress
import graft.transform.Upsert

/** A4 — observe-based progress counters: totals must come from the SAME
  * job that materializes the frame (no second pass), and must match the
  * reference's upserted/kept tally semantics.
  */
class ProgressSpec extends SparkSpec {
  import spark.implicits._

  test("observed: row and null-key tallies from one materialization") {
    val df = Seq(Some(1L), Some(2L), None, Some(4L), None)
      .toDF("k")
    val (withMetrics, obs) = Progress.observed(df, "k")
    withMetrics.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("rows") === 5L)
    assert(m("null_keys") === 2L)
  }

  test("observedMerge: upserted vs kept split matches the merge result") {
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val incoming = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    // the Upsert.upsert _gen convention, observed before the drop
    val tagged = existing.withColumn("_gen", lit(0))
      .unionByName(incoming.withColumn("_gen", lit(1)))
    val merged = Upsert.latestByKey(tagged, Seq("k"), col("_gen"))
    val (withMetrics, obs) = Progress.observedMerge(merged, "_gen")
    val rows = withMetrics.drop("_gen").collect()
    val m = obs.get
    assert(rows.length === 4)
    assert(m("rows") === 4L)
    assert(m("upserted") === 2L) // keys 2 (replaced) and 4 (new)
    assert(m("kept") === 2L)     // keys 1 and 3 survived untouched
  }
}
