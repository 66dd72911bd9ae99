package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sinks
import graft.transform.Upsert

/** Library sinks: CSV round-trip fidelity and raw-zone append +
  * downstream dedup (the reference's rerun-idempotence layering).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeCsv: quoting survives commas and quotes in fields") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/out"
    val df = Seq((1, "Agilent Technologies, Inc."), (2, "He said \"hi\""))
      .toDF("id", "name")
    Sinks.writeCsv(df, dir)
    val back = spark.read.option("header", "true")
      .schema(StructType(Seq(StructField("id", IntegerType),
        StructField("name", StringType))))
      .csv(dir)
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "Agilent Technologies, Inc."), (2, "He said \"hi\"")))
  }

  test("appendRawZone: two appends accumulate; latestByKey restores one-per-key") {
    val dir = Files.createTempDirectory("graft_raw").toString + "/zone"
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2025-01-02 00:00:00")
    Sinks.appendRawZone(Seq(("A", "p0", t0)).toDF("symbol", "payload", "loaded_at"), dir)
    Sinks.appendRawZone(Seq(("A", "p1", t1), ("B", "q0", t0))
      .toDF("symbol", "payload", "loaded_at"), dir)
    val zone = spark.read.parquet(dir)
    assert(zone.count() === 3L)
    val latest = Upsert.latestByKey(zone, Seq("symbol"), col("loaded_at"))
      .collect().map(r => (r.getAs[String]("symbol"), r.getAs[String]("payload")))
      .toSet
    assert(latest === Set(("A", "p1"), ("B", "q0")))
  }
}
