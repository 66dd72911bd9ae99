package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.sources.Sinks

/** Stage a LARGER bench dataset dir from an existing testdata dir (dev
  * aid, not driver contract) — the round-12 sf1.0 bench row's input
  * builder: the flagship pipeline family (q38/q54/q128/q151) scales
  * purely off the DIR NAME (RawZoneGen parses `sf1.0` → 55,000 symbols
  * → a 79.2M-row fact build, generated distributed at run time), so
  * the only table that must physically exist at 10× is `events`
  * (q163's subject). This tool:
  *
  *  - replicates events.parquet `factor`× with event_id/user_id
  *    remapped into disjoint ranges (cardinalities scale with the
  *    data; value/event_type/ts distributions are preserved exactly,
  *    so per-type quantile work scales 10× without changing shape);
  *  - hard-links every other table unchanged (only non-flagship
  *    queries read them; linking keeps per-JVM fixture staging from
  *    aborting — the BASELINE.md row documents which tables are
  *    genuinely at scale).
  *
  * Usage: runMain graft.StageSf <srcDir> <dstDir> [factor=10]
  * (dstDir's NAME must carry the target scale token, e.g.
  * /tmp/graft_sf1.0, because RawZoneGen.sfOf parses it).
  */
object StageSf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageSf <srcDir> <dstDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Sinks.deleteRecursively(dst)
    new java.io.File(dst).mkdirs()
    Option(new java.io.File(src).listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") && f.getName != "events.parquet")
      .foreach { f =>
        if (f.isDirectory) Sinks.hardlinkTree(f.getAbsolutePath, s"$dst/${f.getName}")
        else java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst, f.getName), f.toPath): Unit
      }

    val ev = Tables.events(spark, src)
    val bounds = ev.agg(max("event_id"), max("user_id")).collect().head
    val (idSpan, userSpan) = (bounds.getLong(0) + 1, bounds.getLong(1) + 1)
    val copies = (0 until factor).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * idSpan))
        .withColumn("user_id", col("user_id") + lit(i * userSpan))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    val n = spark.read.parquet(s"$dst/events.parquet").count()
    println(s"[stagesf] $dst staged: events x$factor = $n rows; " +
      "other tables hard-linked from " + src)
    spark.stop()
  }
}
