package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions._
import graft.transform.{Financials, Summary}

/** Reference-parity queries over deterministic in-code fixtures — these
  * validate the exact semantics the reference implements in Python loops
  * (market-cap parse, regex enrichment, employees cast, and the flagship
  * nested-JSON unpivot). Fixtures are inline so the oracle can be an
  * independent DuckDB computation (VALUES + the same declarative logic)
  * or a hand-derived golden row set.
  */
object ReferenceQueries {

  /** Raw-zone fixture (shape of yahoo_financials, details.py:192–201).
    * Covers: latest-per-symbol dedup, yearly/quarterly PK collision
    * (last-write-wins), null + "NaN" + non-scalar metric values, empty
    * metric name, empty panes, a double-encoded payload, and a malformed
    * payload (FIXTURES.md §A2 checklist).
    */
  def fixtureRaw(s: SparkSession): DataFrame = {
    import s.implicits._
    val aaaNew =
      """{"info":{"symbol":"AAA","longName":"Alpha Corp","currency":"USD","financialCurrency":"USD"},
        |"cashflow":{"yearly":{"2024-06-30 00:00:00":{"FreeCashFlow":10.0,"NetIncome":5.5}},
        |"quarterly":{"2024-06-30 00:00:00":{"FreeCashFlow":2.5},"2024-03-31 00:00:00":{"FreeCashFlow":"NaN"}}},
        |"balancesheet":{"yearly":{"2024-06-30 00:00:00":{"TotalAssets":100.0,"":1.0}},"quarterly":{}},
        |"incomestatement":{"yearly":{"2024-06-30 00:00:00":{"Revenue":null}},"quarterly":{}}}"""
        .stripMargin.replace("\n", "")
    val aaaOld =
      """{"info":{"longName":"Alpha Old"},"cashflow":{"yearly":{"2024-06-30 00:00:00":{"FreeCashFlow":999.0}},"quarterly":{}}}"""
    val bbbInner =
      """{"info":{"symbol":"BBB","shortName":"Beta Inc","currency":"EUR","financialCurrency":"USD"},
        |"balancesheet":{"yearly":{"2023-12-31 00:00:00":{"TotalAssets":50.0,"Breakdown":{"x":1}}},"quarterly":{}}}"""
        .stripMargin.replace("\n", "")
    // double-encoded: the JSON document serialized again as a JSON string
    val bbbDouble = "\"" + bbbInner.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    Seq(
      ("AAA", aaaNew, Timestamp.valueOf("2025-01-02 00:00:00")),
      ("AAA", aaaOld, Timestamp.valueOf("2025-01-01 00:00:00")),
      ("BBB", bbbDouble, Timestamp.valueOf("2025-01-02 00:00:00")),
      ("CCC", "{not json", Timestamp.valueOf("2025-01-02 00:00:00")))
      .toDF("symbol", "payload", "loaded_at")
  }

  /** Profile fixture paragraphs exercising F5–F7 edge cases:
    * 3-part HQ, 2-part HQ, 1-part HQ, >3-part tail re-join,
    * no matches, case-insensitivity.
    */
  def fixtureSummaries(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("P1", "Acme Corp, formerly known as OldAcme Inc, was founded in 1987. It is headquartered in Austin, Texas, United States."),
      ("P2", "Beta LLC is headquartered in Paris, France."),
      ("P3", "Gamma was founded in 1999 and is headquartered in Singapore."),
      ("P4", "Delta Industries, headquartered in San Jose, California, Santa Clara County, United States, makes widgets."),
      ("P5", "Epsilon provides services worldwide with no further details"),
      ("P6", "It was FOUNDED IN 2001."))
      .toDF("id", "summary")
  }

  /** Schema-drift fixture (q101): payloads carrying info keys OUTSIDE
    * the ~20 fields Schemas.info types — the reference's payload is
    * open-ended (yfinance `.info` carries ~150 keys and grows without
    * notice, details.py:88–103), and SURVEY §1.2's contract is that the
    * unconsumed rest stays reachable from the raw string WITHOUT a
    * schema change. Shared verbatim with the DuckDB oracle (the strings
    * are interpolated into both engines' queries). Covers: untyped
    * string/number leaves, a nested untyped object, a payload missing
    * the keys, a malformed payload, and a payload with no info object.
    */
  /** q175's lookup key — row 7 exists at every scale factor. */
  private val PointOrderKey = 7L

  private val untypedPayloads: Seq[(String, String)] = Seq(
    "UNT1" -> ("""{"info":{"symbol":"UNT1","longName":"Untyped One",""" +
      """"auditRisk":"7","overallRisk":3,"phone":"+1-512-555-0100",""" +
      """"governance":{"epoch":1717200000}}}"""),
    "UNT2" -> """{"info":{"symbol":"UNT2","longName":"Untyped Two"}}""",
    "UNT3" -> """{not json""",
    "UNT4" -> """{"summary":"payload without an info object"}""")

  /** Unicode-canonicalization fixture (q105), shared verbatim with the
    * DuckDB oracle (raw code points embedded in both queries). Covers:
    * combining accent → precomposed (NFC composition), compatibility
    * singleton (Angstrom sign U+212B → Å U+00C5), an NFC-invariant
    * ligature (negative control — NFC must NOT decompose ﬁ), NBSP +
    * typographic spaces, C0 controls (bell, VT) amid kept \t\n\r\n,
    * and an already-clean string (the fast-path identity).
    */
  private val unicodeFixture: Seq[(Int, String)] = Seq(
    1 -> "Café  du Parc",       // combining acute, dbl space, NBSP
    2 -> "AÅngström",            // Angstrom SIGN → Å (precomposed)
    3 -> "bellandvt",          // C0 controls stripped
    4 -> "line1\r\nline2\tend",            // kept whitespace collapses
    5 -> " em thin　ideo",   // typographic spaces → ASCII
    6 -> "ﬁligature stays",           // NFC-invariant (no K-decomp)
    7 -> "  already clean  ")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // G1 — flagship nested-JSON unpivot → financials fact table.
    "q21_fin_unpivot" -> ((s, _) => Financials.normalize(fixtureRaw(s))),

    // COLLATION-aware aggregation (Spark 4 collations): group under
    // UTF8_LCASE so case variants of a key merge WITHOUT a lower()
    // rewrite of the data — the governed way to make "Web" and "web"
    // one group while the stored strings keep their case. The mixed-
    // case column is derived by law (even doc_ids initcap'd); lower()
    // rides along as the deterministic emitted key (a collated
    // group's representative string is arrival-order-dependent — a
    // trap this query pins shut). If the collation failed to merge,
    // the row count doubles and the hash breaks.
    "q173_collated_group" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("src",
          when(pmod(col("doc_id"), lit(2)) === 0, initcap(col("source")))
            .otherwise(col("source")))
        .groupBy(collate(col("src"), "UTF8_LCASE").as("_k"),
          lower(col("src")).as("src_ci"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .select("src_ci", "n_docs", "n_chars")),

    // SQL PIPE SYNTAX (Spark 4 `|>`): the same hot-type aggregate a
    // classic SELECT would write, expressed as a linear pipeline —
    // the SQL surface a migrating notebook user increasingly writes;
    // parity proven by sharing the classic oracle (integer-cents sum
    // keeps it order-free).
    "q174_pipe_syntax" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_pipe")
      s.sql(
        """FROM events_pipe
          ||> WHERE value > 50.0
          ||> AGGREGATE count(*) AS n,
          |     sum(CAST(round(value * 100) AS BIGINT)) AS _c
          |   GROUP BY event_type
          ||> SELECT event_type, n, CAST(_c AS DOUBLE) / 100.0 AS sum_value
          |""".stripMargin)
    }),

    // PARAMETERIZED SQL (named args): the S7 point query with the key
    // bound as a parameter instead of spliced into the string — the
    // injection-safe form every service endpoint should use; the
    // parameter is typed (no string round-trip), so pushdown is
    // identical to the literal form.
    "q175_parameterized_point" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_param")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          |FROM orders_param WHERE o_orderkey = :k""".stripMargin,
        Map("k" -> PointOrderKey))
    }),

    // Unicode canonicalization (NFC native expression + whitespace/
    // control cleanup) — the pre-dedup text cleaning pass; `changed`
    // pins that normalization altered exactly the rows it should.
    "q105_text_normalize" -> ((s, _) => {
      import s.implicits._
      unicodeFixture.toDF("id", "text").select(
        col("id"),
        graft.ext.TextNorm.canonicalText(col("text")).as("text_norm"),
        (graft.ext.TextNorm.canonicalText(col("text")) =!= col("text"))
          .as("changed"))
    }),

    // Schema-drift access path (SURVEY §1.2): fields the typed schema
    // does NOT carry, read straight off the raw payload string with
    // get_json_object — a per-row codegen'd expression, so at 100 TB
    // this is one projection over the raw-zone scan with no shuffle, no
    // re-ingest, and no schema migration when yfinance adds a key.
    // Malformed documents and absent keys degrade to null (the
    // reference's tolerant-read posture, details.py:88–103).
    "q101_untyped_payload" -> ((s, _) => {
      import s.implicits._
      untypedPayloads.toDF("symbol", "payload").select(
        col("symbol"),
        get_json_object(col("payload"), "$.info.auditRisk")
          .cast("int").as("audit_risk"),
        get_json_object(col("payload"), "$.info.overallRisk")
          .cast("int").as("overall_risk"),
        get_json_object(col("payload"), "$.info.phone").as("phone"),
        get_json_object(col("payload"), "$.info.governance.epoch")
          .cast("bigint").as("governance_epoch"))
    }),

    // The VariantType half of SURVEY §1.2's drift contract (q101 is the
    // get_json_object half): the raw payload parsed ONCE into Spark 4's
    // binary-encoded VARIANT (`try_parse_json` — malformed documents
    // degrade to a null variant, not an error), then typed leaves read
    // with `variant_get`/`try_variant_get`. At 100 TB this is the
    // strictly better plan when MORE THAN ONE leaf is read per row:
    // get_json_object re-tokenizes the full JSON text per path, while
    // VARIANT parses once and each leaf access is an O(log fields)
    // offset walk in the binary encoding — and a VARIANT column stored
    // in parquet is shredded/pushdown-eligible where a JSON string is
    // opaque bytes. Covers: string→int variant cast ("7"), native int,
    // string leaf, nested path, missing-path null (UNT2/UNT4),
    // malformed-doc null (UNT3), and a failed cast via try_variant_get
    // (phone as int → null, where plain variant_get would throw).
    "q126_variant_payload" -> ((s, _) => {
      import s.implicits._
      untypedPayloads.toDF("symbol", "payload")
        .select(col("symbol"), try_parse_json(col("payload")).as("v"))
        .select(
          col("symbol"),
          variant_get(col("v"), "$.info.auditRisk", "int").as("audit_risk"),
          variant_get(col("v"), "$.info.overallRisk", "int")
            .as("overall_risk"),
          variant_get(col("v"), "$.info.phone", "string").as("phone"),
          variant_get(col("v"), "$.info.governance.epoch", "bigint")
            .as("governance_epoch"),
          try_variant_get(col("v"), "$.info.phone", "int")
            .as("phone_as_int"))
    }),

    // F18 — market-cap string → double USD.
    "q18_market_cap" -> ((s, _) => {
      import s.implicits._
      Seq("32.42B", "760.88M", "297.82K", "3,371.44B", "1.5T", "", "n/a", "42")
        .toDF("market_cap")
        .select(col("market_cap"), parseMarketCap(col("market_cap")).as("market_cap_usd"))
    }),

    // F5–F7 — regex enrichment of business summaries.
    "q19_summary_extract" -> ((s, _) => {
      val hq = hqParts(col("summary"))
      fixtureSummaries(s).select(
        col("id"),
        foundedYear(col("summary")).as("founded_year"),
        formerName(col("summary")).as("former_name"),
        hq("hq_city").as("city"), hq("hq_state").as("state"),
        hq("hq_country").as("country"))
    }),

    // F8 — employees digit-strip cast.
    "q20_employees" -> ((s, _) => {
      import s.implicits._
      Seq("1,200", "5000", "about 300 people", "", "n/a")
        .toDF("raw")
        .select(col("raw"), digitsToInt(col("raw")).as("employees"))
    }))

  /** DuckDB oracles. q18/q19/q20 are independent re-computations of the
    * same declarative logic in DuckDB SQL (true differential tests);
    * q21's unpivot is not reasonably SQL-expressible, so its oracle is
    * the hand-derived golden row multiset from the reference semantics
    * (Financilas.py:71–107 applied to the fixture by hand).
    */
  val oracles: Map[String, String] = Map(

    // lower() of the law-derived mixed-case key recovers the stored
    // source, so the oracle needs no case dance — it just states the
    // merged-group law the collation must reproduce
    "q173_collated_group" ->
      """SELECT source AS src_ci, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM documents GROUP BY 1""".stripMargin,

    // the classic-SELECT form of the pipe query
    "q174_pipe_syntax" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS sum_value
        |FROM events WHERE value > 50.0
        |GROUP BY 1""".stripMargin,

    // the literal form of the parameterized point query
    "q175_parameterized_point" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey = 7""".stripMargin,

    // The identical four-step pipeline in DuckDB: nfc_normalize (same
    // UAX #15 composition as java.text.Normalizer) → strip controls →
    // typographic spaces → ASCII space → collapse+trim. The regex
    // classes are interpolated from TextNorm (one definition, two
    // engines); DuckDB regexp_replace needs the explicit 'g' flag
    // (Spark's is global by default).
    "q105_text_normalize" -> {
      val values = unicodeFixture
        .map { case (i, t) => s"($i, '$t')" }.mkString(",\n        |  ")
      s"""WITH src(id, text) AS (VALUES
         |  $values),
         |n AS (
         |  SELECT id, text,
         |    trim(regexp_replace(regexp_replace(regexp_replace(
         |      nfc_normalize(text),
         |      '${graft.ext.TextNorm.ControlClass}', '', 'g'),
         |      '${graft.ext.TextNorm.SpaceClass}', ' ', 'g'),
         |      '\\s+', ' ', 'g')) AS text_norm
         |  FROM src)
         |SELECT id, text_norm, text_norm <> text AS changed FROM n""".stripMargin
    },

    // True differential twin: DuckDB's json_extract_string over the
    // SAME payload strings; json_valid guards the malformed document
    // (DuckDB throws where Spark's get_json_object yields null).
    "q101_untyped_payload" -> {
      val values = untypedPayloads
        .map { case (sym, p) => s"('$sym', '$p')" }.mkString(",\n        |  ")
      def ext(path: String) =
        s"CASE WHEN json_valid(payload) THEN json_extract_string(payload, '$path') END"
      s"""WITH src(symbol, payload) AS (VALUES
         |  $values)
         |SELECT symbol,
         |  CAST(${ext("$.info.auditRisk")} AS INT) AS audit_risk,
         |  CAST(${ext("$.info.overallRisk")} AS INT) AS overall_risk,
         |  ${ext("$.info.phone")} AS phone,
         |  CAST(${ext("$.info.governance.epoch")} AS BIGINT)
         |    AS governance_epoch
         |FROM src""".stripMargin
    },

    // Same documents, same law as q101 — the engine reaches the leaves
    // through the binary VARIANT encoding, the oracle re-derives them
    // from the JSON text (json_valid-guarded; TRY_CAST mirrors
    // try_variant_get's null-on-failed-cast).
    "q126_variant_payload" -> {
      val values = untypedPayloads
        .map { case (sym, p) => s"('$sym', '$p')" }.mkString(",\n        |  ")
      def ext(path: String) =
        s"CASE WHEN json_valid(payload) THEN json_extract_string(payload, '$path') END"
      s"""WITH src(symbol, payload) AS (VALUES
         |  $values)
         |SELECT symbol,
         |  CAST(${ext("$.info.auditRisk")} AS INT) AS audit_risk,
         |  CAST(${ext("$.info.overallRisk")} AS INT) AS overall_risk,
         |  ${ext("$.info.phone")} AS phone,
         |  CAST(${ext("$.info.governance.epoch")} AS BIGINT)
         |    AS governance_epoch,
         |  TRY_CAST(${ext("$.info.phone")} AS INT) AS phone_as_int
         |FROM src""".stripMargin
    },

    "q21_fin_unpivot" ->
      """SELECT stock, yf_name, statement_type, metric, stockcurrency,
        |  financialcurrency, CAST(calendar_year AS INT) AS calendar_year,
        |  CAST(period AS INT) AS period, CAST(value AS DOUBLE) AS value, date
        |FROM (VALUES
        |  ('AAA','Alpha Corp','BS','TotalAssets','USD','USD',2024,4,100.0,DATE '2024-06-30'),
        |  ('AAA','Alpha Corp','CF','FreeCashFlow','USD','USD',2024,1,NULL,DATE '2024-03-31'),
        |  ('AAA','Alpha Corp','CF','FreeCashFlow','USD','USD',2024,2,2.5,DATE '2024-06-30'),
        |  ('AAA','Alpha Corp','CF','NetIncome','USD','USD',2024,4,5.5,DATE '2024-06-30'),
        |  ('AAA','Alpha Corp','IS','Revenue','USD','USD',2024,4,NULL,DATE '2024-06-30'),
        |  ('BBB','Beta Inc','BS','TotalAssets','EUR','USD',2023,4,50.0,DATE '2023-12-31')
        |) t(stock, yf_name, statement_type, metric, stockcurrency,
        |    financialcurrency, calendar_year, period, value, date)""".stripMargin,

    "q18_market_cap" ->
      """WITH src(market_cap) AS (VALUES
        |  ('32.42B'),('760.88M'),('297.82K'),('3,371.44B'),('1.5T'),(''),('n/a'),('42')),
        |parsed AS (
        |  SELECT market_cap,
        |    regexp_extract(upper(trim(replace(market_cap, ',', ''))),
        |      '^([0-9]*\.?[0-9]+)([KMBT]?)$', 1) AS num,
        |    regexp_extract(upper(trim(replace(market_cap, ',', ''))),
        |      '^([0-9]*\.?[0-9]+)([KMBT]?)$', 2) AS sfx
        |  FROM src)
        |SELECT market_cap,
        |  CASE WHEN num = '' THEN NULL
        |       ELSE CAST(num AS DOUBLE) *
        |         CASE sfx WHEN 'K' THEN 1e3 WHEN 'M' THEN 1e6
        |                  WHEN 'B' THEN 1e9 WHEN 'T' THEN 1e12 ELSE 1.0 END
        |  END AS market_cap_usd
        |FROM parsed""".stripMargin,

    "q19_summary_extract" ->
      """WITH src(id, summary) AS (VALUES
        |  ('P1', 'Acme Corp, formerly known as OldAcme Inc, was founded in 1987. It is headquartered in Austin, Texas, United States.'),
        |  ('P2', 'Beta LLC is headquartered in Paris, France.'),
        |  ('P3', 'Gamma was founded in 1999 and is headquartered in Singapore.'),
        |  ('P4', 'Delta Industries, headquartered in San Jose, California, Santa Clara County, United States, makes widgets.'),
        |  ('P5', 'Epsilon provides services worldwide with no further details'),
        |  ('P6', 'It was FOUNDED IN 2001.')),
        |ext AS (
        |  SELECT id,
        |    NULLIF(regexp_extract(summary, '(?i)\bfounded in (\d{4})\b', 1), '') AS fy,
        |    NULLIF(trim(regexp_replace(regexp_extract(summary,
        |      '(?i)\bformerly known as ([^.,;]+)', 1), '\s+', ' ', 'g')), '') AS former,
        |    NULLIF(trim(regexp_replace(regexp_extract(summary,
        |      '(?i)\bheadquartered in ([^.]*?)(?:\.|$)', 1), '\s+', ' ', 'g')), '') AS loc
        |  FROM src),
        |parts AS (
        |  SELECT id, fy, former, loc,
        |    CASE WHEN loc IS NULL THEN NULL
        |         ELSE list_transform(str_split(loc, ','), x -> trim(x)) END AS p
        |  FROM ext)
        |SELECT id, CAST(fy AS INT) AS founded_year, former AS former_name,
        |  CASE WHEN p IS NOT NULL AND len(p) >= 1 THEN p[1] END AS city,
        |  CASE WHEN p IS NOT NULL AND len(p) >= 3 THEN p[2] END AS state,
        |  CASE WHEN p IS NULL THEN NULL
        |       WHEN len(p) = 2 THEN p[2]
        |       WHEN len(p) >= 3 THEN array_to_string(p[3:], ', ') END AS country
        |FROM parts""".stripMargin,

    "q20_employees" ->
      """WITH src(raw) AS (VALUES
        |  ('1,200'),('5000'),('about 300 people'),(''),('n/a'))
        |SELECT raw,
        |  CAST(NULLIF(regexp_replace(raw, '[^0-9]', '', 'g'), '') AS INT) AS employees
        |FROM src""".stripMargin)
}
