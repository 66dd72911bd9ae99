package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.{JsonLines, Sinks}

/** JSON-lines source/sink (q136): escaping fidelity for the characters
  * a web corpus actually contains, null round-trip, and the
  * corrupt-line audit contract (PERMISSIVE never-throw — corrupt lines
  * are observable data, not job failures).
  */
class JsonLinesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("round-trips newline/quote/backslash/unicode text and nulls") {
    val rows = Seq(
      (1L, "plain"),
      (2L, "line1\nline2\ttabbed"),          // control chars must escape
      (3L, "quote\" and \\ backslash"),
      (4L, "unicode: é中😀"), // é, 中, astral 😀
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val path = Sinks.tmpPath("jsonl_spec_roundtrip")
    JsonLines.write(rows, path)
    val back = JsonLines.read(spark, path, schema)
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(back.toSeq == Seq(
      (1L, Some("plain")),
      (2L, Some("line1\nline2\ttabbed")),
      (3L, Some("quote\" and \\ backslash")),
      (4L, Some("unicode: é中😀")),
      (5L, None)))
  }

  test("readAudited quarantines malformed lines without failing the read") {
    val path = Sinks.tmpPath("jsonl_spec_corrupt")
    Sinks.deleteRecursively(path)
    Files.createDirectories(Paths.get(path))
    // Hand-written shard with a genuine corrupt tail: a truncated
    // object and non-JSON garbage between two well-formed lines.
    Files.write(Paths.get(path, "part-0.json"),
      Seq(
        """{"id":1,"text":"good"}""",
        """{"id":2,"text":"trunc""",
        """not json at all""",
        """{"id":3,"text":"also good"}"""
      ).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

    // cache: Spark refuses corrupt-only projections on the raw files
    // (see readAudited doc) — the quarantine select below is one
    val audited = JsonLines.readAudited(spark, path, schema).cache()
    val clean = audited.filter(col("_corrupt_line").isNull)
      .select("id", "text").as[(Long, String)].collect().sortBy(_._1)
    assert(clean.toSeq == Seq((1L, "good"), (3L, "also good")))
    val corrupt = audited.filter(col("_corrupt_line").isNotNull)
      .select("_corrupt_line").as[String].collect().sorted
    assert(corrupt.length == 2)
    assert(corrupt.contains("not json at all"))
    // schema fields null out on corrupt rows — the quarantine feed
    // carries the raw line only
    assert(audited.filter(col("_corrupt_line").isNotNull &&
      col("id").isNotNull).count() == 0)
  }

  test("readAudited refuses a schema that already claims the audit column") {
    val bad = StructType(Seq(StructField("_corrupt_line", StringType)))
    val e = intercept[IllegalArgumentException] {
      JsonLines.readAudited(spark, Sinks.tmpPath("jsonl_spec_never"), bad)
    }
    assert(e.getMessage.contains("_corrupt_line"))
  }
}
