package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** XML interchange — the fourth interchange format next to JSONL
  * (q136), ORC (q99), and Avro (q157). XML is what regulatory feeds,
  * sitemap/crawl manifests, and legacy enterprise buses hand a
  * pipeline; Spark 4 ships native XML support inside spark-sql
  * (`spark.read.xml`, upstreamed from spark-xml), so the engine
  * round-trips it with the same discipline as the other formats:
  *
  *  - reads take an EXPLICIT schema (inference is a second full scan
  *    at 100 TB, and XML inference additionally guesses numeric types
  *    from string content — pinning the reader schema makes every
  *    shard conform or fail loudly);
  *  - `ignoreSurroundingSpaces=false` on read: document text is DATA —
  *    the default trims leading/trailing whitespace inside row tags,
  *    which silently corrupts a text corpus (the XML twin of JSONL's
  *    "never let the codec touch the payload" rule);
  *  - writes are one file per task (shard count = partition count, no
  *    driver funnel); element names come from column names, rows nest
  *    under `rowTag`.
  */
object XmlInterchange {

  /** Unlike Avro (absent from this distribution's DataSourceRegister
    * service file — see sources/AvroInterchange), the XML format IS
    * registered, so the standard short name resolves.
    */
  private val Fmt = "xml"

  def write(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag)
      .format(Fmt).save(path)

  def read(s: SparkSession, path: String, schema: StructType,
           rowTag: String = "row"): DataFrame =
    s.read.schema(schema).option("rowTag", rowTag)
      .option("ignoreSurroundingSpaces", "false")
      .format(Fmt).load(path)
}
