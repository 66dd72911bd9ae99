package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions._
import graft.model.Schemas

/** Stage-0/1 ingest: stock-universe CSV → cleaned, deduplicated symbol
  * dimension with a numeric market cap (reference main.py:311–319 +
  * details.py:260–271 cleaning chain).
  */
object StockUniverse {

  /** S2 — CSV source with explicit schema (no inference pass over the
    * data; at scale schema inference is a full extra read).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.stocksCsv).csv(path)

  /** P3/P4/P5/A1 + F18 — drop all-null rows, blank→null normalize the
    * key, drop null keys, dedup on symbol, parse market_cap to USD.
    * (details.py:262–271; main.py:312–313.)
    */
  def clean(df: DataFrame): DataFrame =
    df.na.drop("all")
      .withColumn("symbol", when(trim(col("symbol")) === "", lit(null))
        .otherwise(trim(col("symbol"))))
      .filter(col("symbol").isNotNull)
      .dropDuplicates("symbol")
      .withColumn("market_cap_usd", parseMarketCap(col("market_cap")))

  // S10 runtime schema resolution lives in RawZone.resolve (wired into
  // Financials.normalize and Summary.normalize).
}
