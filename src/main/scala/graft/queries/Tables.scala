package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata table loader. One parquet per table under the sf dir
  * (TESTDATA.md). Explicit reads — Catalyst pushes filters/projections
  * into the scan per query.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.parquet has shipped ts in TWO precisions across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's reader surfaces as a
    * raw INT64 under legacy nanosAsLong — REQUIRED ENGINE CONFIG, set
    * once in the session builder by Bench/Verify/tests, not mutated
    * here) and plain TIMESTAMP(MICROS). Dispatch on the INFERRED type
    * instead of pinning a schema: an explicit LongType schema over a
    * µs-timestamp file silently yields raw µs and every event-time
    * lands 1000× early (observed when the generator switched). Neither
    * generation carries sub-microsecond digits, so both normalize to
    * the same µs timestamps DuckDB reads.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      // nanos generation: integer division — double division would lose
      // precision above 2^53 ns and shift timestamps by ±1 µs
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampType => df
      // µs generation infers NTZ (isAdjustedToUTC=false); session TZ is
      // pinned UTC, so the cast relabels the same instant exactly
      case _: TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case t => throw new IllegalArgumentException(
        s"events.ts has unexpected type $t under $d")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  /** Explicit documents schema for format hops that must not infer
    * (JSONL — see sources/JsonLines): inference is a second full corpus
    * scan at 100 TB. Matches TESTDATA.md's documents.parquet exactly.
    */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
