package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S10 — runtime schema resolution for raw-zone inputs, the Spark twin
  * of the reference's candidate-name probing (details.py:47–51,
  * Financilas.py:113–133, Summary.py:50–66):
  *  - symbol column: candidate list, case-insensitive, POSITIONAL
  *    fallback to the first column (details.py:51);
  *  - payload column: candidate list, HARD FAIL when absent
  *    (Financilas.py:130–131 raises "no JSON column found");
  *  - loaded_at column: candidate list, null timestamp when absent (a
  *    raw zone without load times degrades to arbitrary-winner dedup,
  *    same as the reference's LIMIT 1 without ORDER BY).
  *
  * Resolution is a driver-side rename over df.schema — zero execution
  * cost; the downstream pipelines then run against the canonical
  * (symbol, payload, loaded_at) shape.
  */
object RawZone {

  val SymbolCandidates: Seq[String] = Seq("symbol", "sym", "ticker", "stock")
  val PayloadCandidates: Seq[String] = Seq("payload", "json", "json_data", "data", "doc")
  val LoadedAtCandidates: Seq[String] = Seq("loaded_at", "load_ts", "loaded", "ingested_at")

  private def find(df: DataFrame, candidates: Seq[String]): Option[String] = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    candidates.map(_.toLowerCase).collectFirst {
      case c if byLower.contains(c) => byLower(c)
    }
  }

  /** Canonicalize a raw-zone DataFrame to (symbol, payload, loaded_at).
    * Throws IllegalArgumentException when no payload-like column exists
    * (the reference's hard-fail path).
    */
  def resolve(df: DataFrame): DataFrame = {
    val sym = find(df, SymbolCandidates).getOrElse(df.columns.head)
    val payload = find(df, PayloadCandidates).getOrElse(
      throw new IllegalArgumentException(
        s"no JSON payload column among [${df.columns.mkString(", ")}]; " +
          s"expected one of [${PayloadCandidates.mkString(", ")}]"))
    find(df, LoadedAtCandidates) match {
      case Some(ts) => df.select(col(sym).as("symbol"),
        col(payload).as("payload"), col(ts).as("loaded_at"))
      case None => df.select(col(sym).as("symbol"), col(payload).as("payload"),
        lit(null).cast("timestamp").as("loaded_at"))
    }
  }
}
