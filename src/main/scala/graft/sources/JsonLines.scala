package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines source/sink — the interchange format LLM training corpora
  * actually ship in (one JSON object per line: WebText, The Pile,
  * RedPajama, FineWeb are all JSONL under compression). A third
  * first-class format hop next to CSV (q35) and ORC (q99), with the two
  * disciplines that matter at 100 TB encoded in the API instead of left
  * to the caller:
  *
  *  - NEVER infer the schema. Spark's JSON schema inference is a full
  *    extra pass over the corpus before the first real job starts; at
  *    100 TB that pre-job costs as much as the job. Both read paths
  *    therefore REQUIRE an explicit StructType — there is deliberately
  *    no inferring overload.
  *  - Corrupt lines are data, not exceptions. Web-scale JSONL always
  *    carries a tail of truncated or mis-encoded lines; a reader that
  *    throws on one line of one shard wastes the cluster run.
  *    [[readAudited]] keeps Spark's PERMISSIVE mode and surfaces the
  *    raw offending line in an audit column so the pipeline can count
  *    and quarantine — the same never-throw contract as the payload
  *    parser (Financials.parsePayload ← reference
  *    `Financilas.py:147–165` parse_json_value).
  *
  * Compression is per-file (text codecs are not block-splittable in
  * Spark), so scan parallelism comes from file COUNT — the layout a
  * web-scale corpus has anyway (millions of shard files). Default gzip
  * (universally available through Hadoop's pure-Java codec); pass
  * "zstd" where the cluster ships the native zstd Hadoop codec.
  */
object JsonLines {

  /** Write `df` as compressed JSON-lines under `path` (one object per
    * line, one file per partition — partition count is the knob that
    * sets downstream read parallelism, since compressed text files are
    * read whole).
    */
  def write(df: DataFrame, path: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Read JSONL under `path` with an explicit schema. Malformed lines
    * null-fill silently (PERMISSIVE default) — use [[readAudited]] when
    * the corrupt tail must be observable.
    */
  def read(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** Read JSONL keeping the corrupt-line audit column: a well-formed
    * line parses into the schema fields with `corruptCol` null; a
    * malformed line yields nulls for every schema field and the raw
    * line text in `corruptCol`. `filter(col(corruptCol).isNotNull)` is
    * the quarantine feed; `isNull` is the clean corpus. Spark refuses a
    * query that projects ONLY the corrupt column from raw files
    * (intermediate results drop it) — select at least one data column
    * alongside it, or cache() first, per Spark's documented contract.
    */
  def readAudited(s: SparkSession, path: String, schema: StructType,
                  corruptCol: String = "_corrupt_line"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a column named $corruptCol; pick another " +
        "corruptCol")
    val audited = StructType(schema.fields :+
      StructField(corruptCol, StringType, nullable = true))
    s.read.schema(audited)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }
}
