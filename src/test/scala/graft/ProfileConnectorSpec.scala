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

  test("filter pushdown prunes the partition plan: equality, IN, range, " +
       "and the empty slice — non-matching payloads are never built") {
    // equality: ONE symbol fetched, one payload built
    ProfileConnector.payloadBuilds.set(0L)
    val one = read(50).filter(col("symbol") === "S00042")
      .select(col("symbol"), length(col("payload")).as("l")).collect()
    assert(one.map(_.getString(0)).toSeq == Seq("S00042"))
    assert(ProfileConnector.payloadBuilds.get() === 1L,
      "equality pushdown must fetch exactly the named symbol")
    // IN: malformed member matches nothing, valid members fetch; the
    // scan builds payloads ONLY for the surviving indices
    ProfileConnector.payloadBuilds.set(0L)
    val got = read(50)
      .filter(col("symbol").isin("S00002", "S00005", "nope", "S99999"))
      .select(col("symbol"), length(col("payload")).as("l"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("S00002", "S00005"))
    assert(ProfileConnector.payloadBuilds.get() === 2L)
    // range: bounds binary-search to index bounds exactly
    ProfileConnector.payloadBuilds.set(0L)
    val ranged = read(50)
      .filter(col("symbol") > "S00044" && col("symbol") < "S00048")
      .select(col("symbol"), length(col("payload")).as("l"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(ranged == Seq("S00045", "S00046", "S00047"))
    assert(ProfileConnector.payloadBuilds.get() === 3L)
    // empty slice: plans zero partitions, reads zero rows, builds none
    ProfileConnector.payloadBuilds.set(0L)
    assert(read(50).filter(col("symbol") > "S00049")
      .select(col("symbol"), col("payload")).count() === 0L)
    assert(ProfileConnector.payloadBuilds.get() === 0L)
    // the pushed filters are visible in the plan (the q160 discipline)
    val plan = read(50).filter(col("symbol") === "S00001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("EqualTo(symbol,S00001)"), plan)
  }

  test("per-partition rate limit paces the fetch (lower time bound)") {
    val t0 = System.nanoTime()
    // 6 symbols, ONE partition, 20/s → 5 inter-arrival gaps of 50 ms
    assert(read(6, parts = 1, rate = 20.0).count() === 6L)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 200.0, f"fetch finished in $elapsedMs%.0f ms — pacing not applied")
  }
}
