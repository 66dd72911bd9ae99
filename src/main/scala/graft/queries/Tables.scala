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
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read the physical INT64 as long (legacy nanosAsLong
    * — REQUIRED ENGINE CONFIG, set once in the session builder by
    * Bench/Verify/tests, not mutated here: a read-time conf.set would be
    * an order-dependent global side effect on the shared session) and
    * convert to a micros timestamp — the testdata has no sub-microsecond
    * digits, so this matches DuckDB's ns→us conversion exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    s.read.schema(schema).parquet(s"$d/events.parquet")
      // integer division — double division would lose precision above
      // 2^53 ns and shift timestamps by ±1 µs
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
