package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence harness (dev aid, not driver contract): run the
  * flagship G1 chain — generate → layout-write raw zone → normalize
  * (parse + 6-pane explode + PK dedup) → layout-write fact → read —
  * at an arbitrary symbol count and report stage wall-clock plus the
  * row-count law check (n × 1,440 PK rows). Default 55,000 symbols =
  * sf1.0 ≈ 10× the reference universe → 79.2M fact rows, the direct
  * would-it-survive-a-10×-scale-up probe for the numbers recorded in
  * BENCH at sf0.1.
  */
object Scale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(55000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.ingest.RawZoneGen
    import graft.sources.Sinks
    import graft.transform.Financials

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val rawPath = Sinks.tmpPath(s"scale_raw_$n")
    val factPath = Sinks.tmpPath(s"scale_fact_$n")
    timed(s"writeRawZone n=$n") {
      Sinks.writeRawZone(RawZoneGen.payloads(spark, n), rawPath)
    }
    val raw = spark.read.parquet(rawPath)
    timed("normalize+writeFact") {
      Financials.normalizeInto(raw, factPath) // fused: one exchange
    }
    val fact = spark.read.parquet(factPath)
    val rows = timed("count fact")(fact.count())
    val expect = n.toLong * 1440L
    println(s"[scale] fact rows $rows expect $expect " +
      (if (rows == expect) "OK" else "MISMATCH"))
    // the reference's own verify query on the produced table
    timed("latestFacts point query") {
      Financials.latestFacts(fact, f"S${n / 2}%05d").collect(): Unit
    }
    spark.stop()
  }
}
