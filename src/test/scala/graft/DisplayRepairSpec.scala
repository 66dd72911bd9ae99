package graft

import org.apache.spark.sql.types._
import graft.sources.{Display, SchemaRepair}

/** O5 head preview and S9 schema conform/repair. */
class DisplayRepairSpec extends SparkSpec {
  import spark.implicits._

  test("preview: header, alignment, truncation, honest more-rows footer") {
    val df = Seq((1L, "short", "a-very-long-string-cell-beyond-twenty"),
      (2L, null, "x")).toDF("id", "s", "t")
    val p = Display.preview(df, n = 10)
    val lines = p.split("\n")
    assert(lines(1).matches("\\|id *\\|s *\\|t *\\|"))
    assert(p.contains("a-very-long-strin...")) // 20-char truncation
    assert(p.contains("NULL"))
    assert(!p.contains("only showing")) // 2 rows, n=10 → no footer
    val p2 = Display.preview(df, n = 1)
    assert(p2.contains("only showing top 1 rows"))
    assert(!p2.contains("NULL")) // second row not rendered
  }

  test("conform: adds missing as typed nulls, try_casts drift, drops extras, reorders") {
    val target = StructType(Seq(
      StructField("id", LongType), StructField("value", DoubleType),
      StructField("note", StringType)))
    val drifted = Seq(("7", "3.5", "keep", "extra"), ("x", "bad", null, "y"))
      .toDF("id", "value", "note", "junk") // all strings, extra column
    val got = SchemaRepair.conform(drifted, target)
    assert(SchemaRepair.conforms(got, target))
    val rows = got.collect()
    assert(rows(0).getLong(0) === 7L)
    assert(rows(0).getDouble(1) === 3.5)
    assert(rows(0).getString(2) === "keep")
    assert(rows(1).isNullAt(0)) // unrepresentable "x" degrades to null
    assert(rows(1).isNullAt(1)) // "bad" → null, load never aborts
    // missing column case
    val narrow = Seq(1L).toDF("id")
    val fixed = SchemaRepair.conform(narrow, target)
    assert(SchemaRepair.conforms(fixed, target))
    assert(fixed.collect()(0).isNullAt(1) && fixed.collect()(0).isNullAt(2))
  }

  test("conform: round-trips through a parquet append to an existing table") {
    val target = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val path = graft.sources.Sinks.tmpPath("test_conform_append")
    graft.sources.Sinks.deleteRecursively(path)
    SchemaRepair.conform(Seq((1L, 1.0)).toDF("id", "v"), target)
      .write.parquet(path)
    // a drifted later generation (string v, extra col) conforms and appends
    SchemaRepair.conform(Seq(("2", "2.5", "zz")).toDF("id", "v", "w"), target)
      .write.mode("append").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() === 2)
    assert(back.schema.fields.map(_.dataType).toSeq ===
      Seq(LongType, DoubleType))
  }
}
