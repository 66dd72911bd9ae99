package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ingest.RawZoneGen
import graft.sources.ProfileConnector
import graft.transform.Financials

/** The DataSource V2 connector (S4 shape): law parity with RawZoneGen,
  * partition planning, column pruning, and per-partition pacing.
  */
class ProfileConnectorSpec extends SparkSpec {

  private def read(n: Int, parts: Int = 4, rate: Double = 0.0): DataFrame =
    spark.read.format(classOf[ProfileConnector].getName)
      .option("symbols", n).option("numPartitions", parts)
      .option("maxPerSecond", rate).load()

  test("connector rows normalize to the same fact table as the generated raw zone") {
    val viaConnector = Financials.normalize(read(12))
    // payloads() includes the stale generation; normalize's latest-per-
    // symbol dedup drops it, so both paths must converge — JSON
    // formatting differences are invisible after from_json
    val viaGenerator = Financials.normalize(RawZoneGen.payloads(spark, 12))
    assert(viaConnector.count() === 12 * 1440L)
    assert(viaConnector.exceptAll(viaGenerator).isEmpty)
    assert(viaGenerator.exceptAll(viaConnector).isEmpty)
  }

  test("partition planning: ranges cover the universe exactly once") {
    val df = read(11, parts = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.select("symbol").distinct().count() === 11L)
    assert(df.count() === 11L)
    // more partitions than symbols: clamps, still exact coverage
    val tiny = read(3, parts = 8)
    assert(tiny.rdd.getNumPartitions === 3)
    assert(tiny.count() === 3L)
  }

  test("column pruning reaches the reader: key-only scan never builds a payload") {
    ProfileConnector.payloadBuilds.set(0L)
    // consume the key columns for real (count() alone would prune
    // everything and prove nothing)
    val keys = read(20).select("symbol", "loaded_at").collect()
    assert(keys.length === 20 && keys.forall(_.getString(0).startsWith("S")))
    assert(ProfileConnector.payloadBuilds.get() === 0L,
      "pruned scan built payloads")
    // consuming the payload column does pay for it — once per row
    val lens = read(5).select(length(col("payload")).as("len"))
      .agg(min(col("len"))).collect().head.getInt(0)
    assert(lens > 10000) // a real nested document, not a stub
    assert(ProfileConnector.payloadBuilds.get() === 5L)
  }

  test("per-partition rate limit paces the fetch (lower time bound)") {
    val t0 = System.nanoTime()
    // 6 symbols, ONE partition, 20/s → 5 inter-arrival gaps of 50 ms
    assert(read(6, parts = 1, rate = 20.0).count() === 6L)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 200.0, f"fetch finished in $elapsedMs%.0f ms — pacing not applied")
  }
}
