package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf-proportional synthetic raw zone — payloads shaped
  * exactly like the reference loader's output (details.py:139–153: 3
  * statements × 2 frequencies × {dateString → {metric → value}} panes
  * plus an `info` profile object), at the reference's scale (≈1,432 fact
  * rows per symbol, Total.PNG: 7,891,303 rows over 5,510 symbols — here
  * 5,500 symbols × 1,440 PK rows = 7.92M at sf0.1).
  *
  * Everything is a pure arithmetic function of the symbol index — no RNG,
  * no timestamps, no driver state — so the DuckDB correctness oracle can
  * REGENERATE the expected fact/summary tables from first principles
  * (range() cross joins) and hash-compare against the engine's full
  * generate → JSON-encode → parse → unpivot → dedup pipeline. Any row the
  * pipeline loses or mangles shows up as a hash mismatch.
  *
  * Generation itself is distributed and codegen'd: one `spark.range`
  * over the symbol ids, payload assembled by Column expressions and ONE
  * `to_json` — no driver-side loop, so the generator scales with the
  * cluster exactly like a real ingest would.
  */
object RawZoneGen {

  /** 5 yearly period-ends + 4 quarterly period-ends. The 2024-12-31
    * yearly/quarterly collision is deliberate: it exercises the PK
    * last-write-wins pane precedence (Financilas.py:175–182) on every
    * (symbol, statement, metric) — 180 collisions per symbol at scale.
    */
  val YearlyDates: Seq[String] =
    Seq("2020-12-31", "2021-12-31", "2022-12-31", "2023-12-31", "2024-12-31")
      .map(_ + " 00:00:00")
  val QuarterlyDates: Seq[String] =
    Seq("2024-03-31", "2024-06-30", "2024-09-30", "2024-12-31")
      .map(_ + " 00:00:00")

  /** Statement order = pane precedence order (Financials.panes). */
  val Statements: Seq[(String, String)] =
    Seq(("CF", "cashflow"), ("IS", "incomestatement"), ("BS", "balancesheet"))

  val MetricsPerStatement = 60

  /** Scale factor from the testdata dir name ("…/sf0.01" → 0.01). */
  def sfOf(dir: String): Double =
    "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)

  /** sf0.1 → 5,500 symbols (the reference universe is 5,510). */
  def symbolCount(sf: Double): Int = math.max(10, math.round(sf * 55000).toInt)

  /** Emitted rows per symbol: 3 × 60 × (5 + 4) = 1,620; distinct PK rows
    * after the yearly/quarterly 2024-12-31 collision: 1,440.
    */
  def emittedRowsPerSymbol: Int = Statements.size * MetricsPerStatement *
    (YearlyDates.size + QuarterlyDates.size)

  /** The leaf-value law, shared verbatim with the DuckDB oracle:
    * k = i·31 + s·17 + f·13 + d·7 + m·3; every 97th leaf is null
    * (reference payloads carry plenty of nulls — P7/P8 stay exercised at
    * scale); otherwise (k mod 1000) + (k mod 7)·0.25 — exact in binary
    * floating point, so the JSON round-trip and the oracle agree
    * bit-for-bit.
    */
  private def leafValue(i: Column, s: Int, f: Int, d: Int, m: Int,
                        stale: Boolean): Column = {
    val k = i * 31 + lit(s * 17 + f * 13 + d * 7 + m * 3)
    if (stale) (k % 1000).cast("double") + lit(0.75) // must NEVER win the dedup
    else when(k % 97 === 0, lit(null).cast("double"))
      .otherwise((k % 1000).cast("double") + (k % 7).cast("double") * lit(0.25))
  }

  private def metricName(code: String, m: Int): String = f"${code}_M$m%02d"

  /** One {date → {metric → value}} pane (ORIENTATION: outer keys are
    * dates — Financilas.py:84–96).
    */
  private def pane(i: Column, code: String, s: Int, f: Int,
                   dates: Seq[String], stale: Boolean): Column =
    map_from_arrays(
      array(dates.map(lit): _*),
      array(dates.indices.map { d =>
        map_from_arrays(
          array((0 until MetricsPerStatement).map(m => lit(metricName(code, m))): _*),
          array((0 until MetricsPerStatement).map(m => leafValue(i, s, f, d, m, stale)): _*))
      }: _*))

  private def infoStruct(i: Column, stale: Boolean): Column = {
    val namePrefix = if (stale) "Stale Corp " else "Synth Corp "
    val founded = (lit(1900) + i % 120).cast("string")
    val former = when(i % 3 === 0,
      concat(lit(", formerly known as Old Synth "), i.cast("string"), lit(",")))
      .otherwise(lit(""))
    val hq = element_at(array(
      lit(" It is headquartered in Austin, Texas, United States."),
      lit(" It is headquartered in Paris, France."),
      lit(" It is headquartered in Singapore."),
      lit("")), (i % 4).cast("int") + 1)
    // exercises F5 (founded), F6 (former name) and all three F7 HQ-split
    // arities, plus the no-match case, across the whole universe
    val summary = concat(lit(namePrefix), i.cast("string"), former,
      lit(" was founded in "), founded, lit("."), hq)
    struct(
      concat(lit("S"), lpad(i.cast("string"), 5, "0")).as("symbol"),
      concat(lit(namePrefix), i.cast("string")).as("longName"),
      element_at(array(lit("USD"), lit("EUR"), lit("JPY"), lit("GBP")),
        (i % 4).cast("int") + 1).as("currency"),
      lit("USD").as("financialCurrency"),
      ((i * 37) % 90000 + 10).cast("string").as("fullTimeEmployees"),
      element_at(array(lit("Technology"), lit("Energy"), lit("Healthcare"),
        lit("Financials"), lit("Utilities")), (i % 5).cast("int") + 1).as("sector"),
      concat(lit("Industry "), (i % 7).cast("string")).as("industry"),
      concat(lit("https://synth"), i.cast("string"), lit(".example")).as("website"),
      summary.as("longBusinessSummary"))
      // city/state/country deliberately OMITTED from info → the Summary
      // pipeline must fill them from the regex enrichment (python-or "")
  }

  /** The raw zone: one fresh payload per symbol (loaded 2025-08-15 or
    * -16 by parity — two load-date partitions, like the reference's
    * multi-session run), plus a STALE older payload for every 10th
    * symbol whose values/names differ — the latest-per-symbol dedup
    * (J2) must drop every one of them or the oracle hash diverges.
    */
  /** Stage the generated raw zone to parquet ONCE per JVM per size
    * (load-date-partitioned layout) and return its path. Both scale
    * queries read from here — the fixture is generated and written a
    * single time, like the driver's own testdata, while each query's
    * ENGINE work (parse, unpivot, dedup, extract) always runs in full.
    */
  private val staged = scala.collection.concurrent.TrieMap[Int, String]()
  def stagedPath(spark: SparkSession, numSymbols: Int): String =
    staged.getOrElseUpdate(numSymbols, {
      val p = graft.sources.Sinks.tmpPath(s"rawzone_$numSymbols")
      graft.sources.Sinks.writeRawZone(payloads(spark, numSymbols), p)
      p
    })

  def payloads(spark: SparkSession, numSymbols: Int): DataFrame = {
    def gen(stale: Boolean): DataFrame = {
      val i = col("i")
      val stmts = Statements.zipWithIndex.map { case ((code, field), s) =>
        struct(
          pane(i, code, s, 0, YearlyDates, stale).as("yearly"),
          pane(i, code, s, 1, QuarterlyDates, stale).as("quarterly")).as(field)
      }
      val loadedAt =
        if (stale) to_timestamp(lit("2025-08-14 00:00:00"))
        else to_timestamp(concat(lit("2025-08-"),
          (lit(15) + i % 2).cast("string"), lit(" 00:00:00")))
      spark.range(numSymbols).toDF("i").select(
        concat(lit("S"), lpad(i.cast("string"), 5, "0")).as("symbol"),
        to_json(struct((infoStruct(i, stale).as("info") +: stmts): _*)).as("payload"),
        loadedAt.as("loaded_at"),
        i.as("i"))
    }
    gen(stale = false)
      .unionByName(gen(stale = true).filter(col("i") % 10 === 0))
      .drop("i")
  }
}
