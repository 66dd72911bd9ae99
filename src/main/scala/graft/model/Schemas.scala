package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the reference-shaped data model (SURVEY.md §1).
  * Output schemas are fixed (reference DDL); the raw payload is typed only
  * on the consumed fields — everything else stays reachable through the
  * raw JSON string (SURVEY.md §7.4 risk: ~150 open-ended info keys).
  */
object Schemas {

  /** Stage-0 stock universe CSV (reference stocks_full.csv:1;
    * construction main.py:311). market_cap is a human-formatted string —
    * parsing it to double is the engine's job (Functions.parseMarketCap).
    */
  val stocksCsv: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("company", StringType),
    StructField("industry", StringType),
    StructField("market_cap", StringType)))

  /** Raw zone row (reference yahoo_financials DDL, details.py:192–201).
    * The surrogate id is dropped — never queried in the reference.
    */
  val rawZone: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("payload", StringType),
    StructField("loaded_at", TimestampType)))

  /** One statement pane: {dateString → {metricName → value}}.
    * ORIENTATION TRAP (SURVEY.md §7.4; Financilas.py:84–96): outer keys
    * are DATE strings like "2024-12-31 00:00:00", inner keys are METRIC
    * names. Leaf values are parsed as STRING first so that a non-scalar
    * leaf (dict/list) degrades to an uncastable string → null value
    * (reference P7 skips non-scalars, Financilas.py:99–100) instead of
    * nulling the whole pane.
    */
  val pane: DataType = MapType(StringType, MapType(StringType, StringType))

  val statement: StructType = StructType(Seq(
    StructField("yearly", pane),
    StructField("quarterly", pane)))

  /** info — only the ~20 fields the reference consumes
    * (Summary.py:149–204, Financilas.py:73–76).
    */
  val info: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("ticker", StringType),     // stock fallback #2 (Summary.py:152)
    StructField("longName", StringType),
    StructField("shortName", StringType),
    StructField("displayName", StringType),
    StructField("name", StringType),       // yf_name fallback #4 (Summary.py:155–157)
    StructField("longBusinessSummary", StringType),
    StructField("sector", StringType),
    StructField("sectorDisp", StringType),
    StructField("industry", StringType),
    StructField("industryDisp", StringType),
    StructField("website", StringType),
    StructField("irWebsite", StringType),
    StructField("fullTimeEmployees", StringType), // int|str in the wild → string + digitsToInt
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("province", StringType),
    StructField("country", StringType),
    StructField("currency", StringType),
    StructField("financialCurrency", StringType)))

  /** Full payload document (assembled at details.py:139–153). The extra
    * top-level `summary` / `profile.longBusinessSummary` fields back the
    * long_summary fallback chain (Summary.py:158–162) for payloads not
    * assembled by the reference's own loader. The root-level copies of
    * every info field back the reference's `info = obj.get('info') or
    * obj` fallback (Summary.py:151): a payload with NO `info` key reads
    * all profile fields from the root object instead.
    */
  val payload: StructType = StructType(
    Seq(
      StructField("info", info),
      StructField("summary", StringType),
      StructField("profile", StructType(Seq(
        StructField("longBusinessSummary", StringType)))),
      StructField("cashflow", statement),
      StructField("balancesheet", statement),
      StructField("incomestatement", statement))
      ++ info.fields) // root-level info-field copies (Summary.py:151)

  /** Profile-pipeline payload view: everything Summary consumes, WITHOUT
    * the statement panes. Parsing the raw document against this reduced
    * schema skips materializing the (large) per-date metric maps — the
    * Summary job tokenizes each document once and builds only the ~20
    * scalar fields it reads. At 100 TB that is the difference between a
    * profile job that decodes 3 statements × 2 frequencies of maps per
    * document and one that doesn't.
    */
  val profilePayload: StructType = StructType(
    Seq(
      StructField("info", info),
      StructField("summary", StringType),
      StructField("profile", StructType(Seq(
        StructField("longBusinessSummary", StringType)))))
      ++ info.fields) // root-level info-field copies (Summary.py:151)

  /** Long-format fact table (reference financials DDL,
    * Financilas.py:16–30). Logical key:
    * (stock, statement_type, metric, date).
    */
  val financials: StructType = StructType(Seq(
    StructField("stock", StringType, nullable = false),
    StructField("yf_name", StringType),
    StructField("statement_type", StringType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("stockcurrency", StringType),
    StructField("financialcurrency", StringType),
    StructField("calendar_year", IntegerType),
    StructField("period", IntegerType),
    StructField("value", DoubleType),
    StructField("date", DateType)))

  /** Wide profile dimension (reference summary DDL, Summary.py:17–35). */
  val summary: StructType = StructType(Seq(
    StructField("stock", StringType, nullable = false),
    StructField("yf_name", StringType),
    StructField("long_summary", StringType),
    StructField("sector", StringType),
    StructField("industry", StringType),
    StructField("website", StringType),
    StructField("employees", IntegerType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("currency", StringType),
    StructField("founded_year", IntegerType),
    StructField("former_name", StringType),
    StructField("updated_at", TimestampType)))
}

/** Typed row models for API boundaries (SURVEY.md §1.3). */
case class FinancialFact(
    stock: String, yf_name: Option[String], statement_type: String,
    metric: String, stockcurrency: Option[String],
    financialcurrency: Option[String], calendar_year: Option[Int],
    period: Option[Int], value: Option[Double], date: java.sql.Date)

case class CompanySummary(
    stock: String, yf_name: Option[String], long_summary: Option[String],
    sector: Option[String], industry: Option[String], website: Option[String],
    employees: Option[Int], city: Option[String], state: Option[String],
    country: Option[String], currency: Option[String],
    founded_year: Option[Int], former_name: Option[String],
    updated_at: java.sql.Timestamp)
