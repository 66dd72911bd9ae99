package graft.sources

import org.apache.spark.sql.DataFrame

/** Library write paths (reference S3/S5):
  *  - CSV sink: main.py:318–319 (stocks_full.csv emit) and
  *    details.py:301–303 (symbols_loaded.csv emit). Spark's default
  *    quoting is minimal-style, matching the reference's QUOTE_MINIMAL.
  *  - Raw-zone append sink: details.py:207–227 (per-symbol INSERT +
  *    COMMIT). Spark file-commit protocol gives task-level atomicity —
  *    the engine-side analogue of the reference's per-row transaction.
  *
  * Both are thin, deliberately: the sink IS the DataFrame writer; the
  * library's job is only to pin the options that reference parity
  * requires (header on, append semantics for the raw zone).
  */
object Sinks {

  /** S3 — header'd CSV directory sink (minimal quoting = Spark default). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S5 — raw-zone append (parquet). Idempotence across reruns comes
    * from the downstream latest-per-key dedup (Upsert.latestByKey), not
    * from the sink — exactly the reference's skip-existing + upsert
    * layering.
    */
  def appendRawZone(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)
}
