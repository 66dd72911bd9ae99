package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import graft.plans.ZOrderExpr
import graft.sources.ZOrderLayout

/** Z-order expression + layout tests: interleave law vs a Scala model
  * (under CODEGEN_ONLY so a silent interpreter fallback is a hard
  * error), loud domain violations, and the data-skipping claim itself —
  * a 2-D box over the z-clustered layout must touch a small fraction of
  * the files that the single-column-sorted layout touches.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference model: textbook bit-interleave. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L)((z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1))

  test("zorder2 equals the bit-interleave model (CODEGEN_ONLY)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val rows = (0 until 500).map { i =>
        // deterministic spread incl. 0, maxima, adjacent codes
        val x = (i * 2654435761L) % (1L << 21)
        val y = (i * 40503L + 7) % (1L << 21)
        (x, y)
      } ++ Seq((0L, 0L), ((1L << 21) - 1, (1L << 21) - 1), (1L, 0L), (0L, 1L))
      val got = rows.toDF("x", "y")
        .select(col("x"), col("y"),
          ZOrderExpr.zorder2(col("x"), col("y"), 21).as("z"))
        .as[(Long, Long, Long)].collect()
      got.foreach { case (x, y, z) => assert(z == morton(x, y, 21), s"($x,$y)") }
      // bijectivity on the sample (interleave must not collide)
      assert(got.map(_._3).distinct.length == got.length)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("zorder2 throws loudly on out-of-domain coordinates") {
    for ((x, y) <- Seq((-1L, 0L), (0L, -1L), (1L << 8, 0L))) {
      val e = intercept[Exception] {
        Seq((x, y)).toDF("x", "y")
          .select(ZOrderExpr.zorder2(col("x"), col("y"), 8)).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(e).exists(_.contains("out of domain")), s"($x,$y): $e")
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge
    intercept[IllegalArgumentException](
      ZOrderExpr(ColumnBridge.expression(lit(1L)),
        ColumnBridge.expression(lit(1L)), 32))
  }

  test("z-layout box scan touches far fewer files than a 1-D sort layout") {
    // 256x256 grid, one row per cell; box = 16x16 (0.4% of the area)
    val n = 256
    val grid = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("x"),
        pmod(col("id"), lit(n)).cast("long").as("y"))
    val files = 64
    val zPath = graft.sources.Sinks.tmpPath("zorder_spec_z")
    val linPath = graft.sources.Sinks.tmpPath("zorder_spec_lin")
    ZOrderLayout.write(grid, "x", "y", 8, files, zPath)
    // 1-D control: same file count, clustered by x only — placed by the
    // same arithmetic (seed-free) partitioner so both layouts are exact.
    ZOrderLayout.writeRangeClustered(grid, "x", n.toLong, files, linPath)

    def touched(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("x").between(17, 32) && col("y").between(100, 115))
      (df.count(), df.select(input_file_name()).distinct().count())
    }
    val (zRows, zFiles) = touched(zPath)
    val (lRows, lFiles) = touched(linPath)
    assert(zRows == 256 && lRows == 256) // same answer from either layout
    // Placement is arithmetic, so the touched-file counts are EXACT, not
    // margins: 64 files over the 2^16 z domain = one aligned 32x32 tile
    // per file, and the box x[17,32]xy[100,115] crosses only the x=32
    // tile boundary inside y-tile [96,127] -> exactly 2 z files. The
    // x-sorted control holds 4 x-values per file, so the 16-wide slice
    // x[17,32] spans files 4..8 -> exactly 5 files.
    assert(zFiles == 2, s"z=$zFiles (expected exactly 2)")
    assert(lFiles == 5, s"lin=$lFiles (expected exactly 5)")
    assert(zFiles * 2 <= lFiles, s"z=$zFiles lin=$lFiles")
  }

  test("layout write rejects the reserved column and keeps nulls out") {
    val df = Seq((Some(1L), 2L), (None, 3L)).toDF("x", "y")
    val p = graft.sources.Sinks.tmpPath("zorder_spec_nulls")
    ZOrderLayout.write(df, "x", "y", 8, 2, p)
    assert(spark.read.parquet(p).count() == 1) // null coordinate excluded
    intercept[IllegalArgumentException](
      ZOrderLayout.write(df.withColumn("_graft_z", lit(1)), "x", "y", 8, 2, p))
  }
}
