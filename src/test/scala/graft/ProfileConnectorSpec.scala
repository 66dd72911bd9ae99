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
    // 6 symbols, ONE partition, 20/s → 5 inter-arrival gaps of 50 ms.
    // Collect ROWS, not count(): count() now pushes down to arithmetic
    // and (correctly) never fetches — the pacing contract is about the
    // row path.
    assert(read(6, parts = 1, rate = 20.0)
      .select("symbol").collect().length === 6)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 200.0, f"fetch finished in $elapsedMs%.0f ms — pacing not applied")
  }

  test("aggregate pushdown: global count/min/max fold into arithmetic " +
       "on the partition plan — no symbol visited, no payload built, " +
       "no rate-limit token spent (q195)") {
    ProfileConnector.payloadBuilds.set(0L)
    // a HEAVY throttle (1 fetch/s over 50 symbols = ~50 s if any row
    // were fetched) — the aggregate must not spend a single token
    val t0 = System.nanoTime()
    val agg = read(50, parts = 4, rate = 1.0)
      .filter(col("symbol") >= "S00005" && col("symbol") <= "S00017")
      .groupBy()
      .agg(count(col("symbol")).as("n"),
        min(col("symbol")).as("first_symbol"),
        max(col("symbol")).as("last_symbol"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: ["), plan.take(3000))
    val row = agg.collect().head
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(row.getLong(0) === 13L)
    assert(row.getString(1) === "S00005" && row.getString(2) === "S00017")
    assert(ProfileConnector.payloadBuilds.get() === 0L,
      "pushed aggregate built payloads")
    assert(elapsedMs < 5000.0,
      f"aggregate took $elapsedMs%.0f ms — it fetched rows through the throttle")
    // the empty slice aggregates to count 0 / null bounds (one
    // pre-aggregated row always lands — sum-of-partials semantics)
    val empty = read(50).filter(col("symbol") > "S00049")
      .groupBy().agg(count(col("symbol")).as("n"), min(col("symbol")).as("lo"))
      .collect().head
    assert(empty.getLong(0) === 0L && empty.isNullAt(1))
    // a GROUPED aggregate is refused (stays un-pushed) and still
    // answers exactly through the ordinary scan
    val grouped = read(10)
      .groupBy(col("loaded_at")).agg(count(col("symbol")).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(grouped.collect().map(_.getLong(1)).sum === 10L)
  }

  test("limit pushdown chunks the partition plan to k symbols; top-N " +
       "on the symbol order slices the first/last k of the range — " +
       "payloads outside the slice are never built") {
    // LIMIT 1 after a pushed range — the reference's point-fetch
    // shape: one symbol planned, one payload built
    ProfileConnector.payloadBuilds.set(0L)
    val lim1 = read(50).filter(col("symbol") >= "S00005" &&
        col("symbol") <= "S00017")
      .limit(1)
    assert(lim1.queryExecution.executedPlan.toString
      .contains("PushedLimit: 1"))
    val got1 = lim1.select(col("symbol"), length(col("payload"))).collect()
    assert(got1.length === 1 && got1.head.getString(0) === "S00005")
    assert(ProfileConnector.payloadBuilds.get() === 1L,
      "LIMIT 1 fetched more than one symbol")
    // top-N DESCENDING: the LAST k of the matching range, re-sorted
    // above by Spark (partial push) — order and content both exact
    ProfileConnector.payloadBuilds.set(0L)
    val top = read(50).filter(col("symbol") >= "S00005" &&
        col("symbol") <= "S00017")
      .orderBy(col("symbol").desc).limit(4)
    assert(top.queryExecution.executedPlan.toString
      .contains("PushedTopN: [symbol DESC, 4]"))
    val gotTop = top.select(col("symbol"), length(col("payload"))).collect()
    assert(gotTop.map(_.getString(0)).toSeq ===
      Seq("S00017", "S00016", "S00015", "S00014"))
    assert(ProfileConnector.payloadBuilds.get() === 4L,
      "top-N fetched outside its slice")
    // ascending top-N takes the FIRST k
    val asc = read(50).filter(col("symbol") >= "S00005")
      .orderBy(col("symbol")).limit(2)
      .select("symbol").collect().map(_.getString(0)).toSeq
    assert(asc === Seq("S00005", "S00006"))
    // a limit wider than the match set returns everything, exactly
    assert(read(50).filter(col("symbol") >= "S00048").limit(10)
      .select("symbol").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("S00048", "S00049"))
    // a sort the index law cannot invert is REFUSED (no TopN push)
    // and still answers exactly through the ordinary scan
    val byLoaded = read(10).orderBy(col("loaded_at").desc).limit(3)
    assert(!byLoaded.queryExecution.executedPlan.toString
      .contains("PushedTopN"))
    assert(byLoaded.count() === 3L)
    // limit + IN point-set: slices the sorted surviving list
    ProfileConnector.payloadBuilds.set(0L)
    val inLim = read(50)
      .filter(col("symbol").isin("S00031", "S00007", "S00019"))
      .orderBy(col("symbol").desc).limit(2)
      .select(col("symbol"), length(col("payload"))).collect()
    assert(inLim.map(_.getString(0)).toSeq === Seq("S00031", "S00019"))
    assert(ProfileConnector.payloadBuilds.get() === 2L)
  }
}
