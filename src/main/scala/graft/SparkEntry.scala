package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ext.{CurationQueries, ExtQueries}
import graft.queries._
import graft.transform.Financials

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` aggregates every per-operator query pack; `oracleSql` holds
  * the DuckDB-equivalent SQL for each (omitted only where genuinely not
  * SQL-expressible → driver falls back to a rows-only check).
  */
object SparkEntry {

  /** Flagship (SURVEY.md §7.5): the reference's own verify query — for a
    * symbol, the 10 most recent financial facts (date desc, statement,
    * metric) — on a fact table produced live by the G1 nested-JSON
    * unpivot from raw payloads. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Financials.latestFacts(
      Financials.normalize(ReferenceQueries.fixtureRaw(spark)), "AAA")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ ReferenceQueries.defs ++ ExtQueries.defs ++
      PipelineQueries.defs ++ ScaleQueries.defs ++ CurationQueries.defs ++
      AnalyticsQueries.defs ++ MiningQueries.defs ++ AuditQueries.defs ++
      TableFormatQueries.defs

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ ReferenceQueries.oracles ++
      ExtQueries.oracles ++ PipelineQueries.oracles ++ ScaleQueries.oracles ++
      CurationQueries.oracles ++ AnalyticsQueries.oracles ++
      MiningQueries.oracles ++ AuditQueries.oracles ++
      TableFormatQueries.oracles
}
