package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Avro interchange — the row-oriented third interchange format next
  * to JSONL (JsonLines, q136) and ORC (q99). Avro is what the Kafka /
  * schema-registry world hands a training-data pipeline (a topic dump
  * IS a dir of Avro container files), so the engine must round-trip it
  * losslessly even though its own layouts are columnar. Spark 4 ships
  * the Avro format inside spark-sql (no external spark-avro module
  * needed — `org.apache.spark.sql.avro.AvroFileFormat` is on every
  * executor's classpath already).
  *
  * Same discipline as JsonLines:
  *
  *  - reads take an EXPLICIT schema. Avro files embed a writer schema,
  *    but trusting it per-file is how a mixed-generation topic dump
  *    silently widens or reorders columns mid-scan; pinning the reader
  *    schema makes every shard conform or fail loudly. It also lets
  *    the scan project: Avro is row-major, so column pruning cannot
  *    skip bytes the way parquet does, but it still prunes the
  *    DESERIALIZED width (ReadSchema in the plan shows the narrow
  *    struct).
  *  - writes are one container file per task — at 100 TB the shard
  *    count is the partition count, no driver-side funnel; snappy
  *    block compression by default (the schema-registry ecosystem's
  *    default), zstd/deflate available where the cluster prefers.
  */
object AvroInterchange {

  /** This distribution compiles the Avro format into spark-sql but
    * does not list it in the DataSourceRegister service file, so the
    * "avro" short name fails lookup; the fully-qualified FileFormat
    * class bypasses the registry and loads the same code path.
    */
  private val Fmt = "org.apache.spark.sql.avro.AvroFileFormat"

  def write(df: DataFrame, path: String,
            compression: String = "snappy"): Unit =
    df.write.mode("overwrite").option("compression", compression)
      .format(Fmt).save(path)

  def read(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).format(Fmt).load(path)
}
