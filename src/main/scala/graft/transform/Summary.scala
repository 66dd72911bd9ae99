package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Functions._
import graft.model.Schemas

/** Profile extraction — raw payload documents → wide `summary` dimension
  * (reference Summary.py:149–221 normalize_summary + 122–147
  * extract_from_summary), re-expressed as one select of coalesce /
  * regexp_extract / split / case expressions. Zero UDFs; the whole row
  * is produced inside whole-stage codegen from a single from_json.
  */
object Summary {

  def normalize(raw: DataFrame): DataFrame = {
    val latest = Upsert.latestByKey(
      raw.select(col("symbol"), col("payload"), col("loaded_at")),
      Seq("symbol"), col("loaded_at"))

    val p = latest.withColumn("p", Financials.parsePayload(col("payload")))
    val info = col("p.info")
    val summaryTxt = cleanText(info("longBusinessSummary"))
    val hq = hqParts(info("longBusinessSummary"))

    p.select(
      // stock: info.symbol falls back to the raw key (Summary.py:151–153)
      coalesce(info("symbol"), col("symbol")).as("stock"),
      // F9 coalesce chains (Summary.py:154–173, 200–204)
      coalesce(info("longName"), info("shortName"), info("displayName")).as("yf_name"),
      when(summaryTxt === "", lit(null)).otherwise(summaryTxt).as("long_summary"),
      coalesce(info("sector"), info("sectorDisp")).as("sector"),
      coalesce(info("industry"), info("industryDisp")).as("industry"),
      coalesce(info("website"), info("irWebsite")).as("website"),
      digitsToInt(info("fullTimeEmployees")).as("employees"),          // F8
      // non-destructive enrich: explicit field first, regex-HQ fallback
      coalesce(info("city"), hq("hq_city")).as("city"),
      coalesce(info("state"), info("province"), hq("hq_state")).as("state"),
      coalesce(info("country"), hq("hq_country")).as("country"),
      coalesce(info("currency"), info("financialCurrency")).as("currency"),
      foundedYear(info("longBusinessSummary")).as("founded_year"),      // F5
      formerName(info("longBusinessSummary")).as("former_name"),        // F6
      current_timestamp().as("updated_at"))
      .filter(col("stock").isNotNull)                                   // P10
  }
}
