package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe for a comma-separated list of declared queries
  * (args(1), default: the incremental-maintenance family): warms each
  * query once, then reports min-of-3 through the noop sink — the bench
  * methodology without the full-surface warmup, for fast iteration.
  * Not part of the driver contract.
  */
object ProbeIvm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse(
      "q54_incremental_fact,q128_incremental_rollup,q131_stream_ivm," +
        "q134_stream_ivm_mvcc").split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus) // A/B aid
    var b = Tuning.localIo(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
    // A/B aid: extra confs as "k=v;k=v"
    sys.env.get("SPARK_GRAFT_AB_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b = b.config(k, v)
    })
    val spark = b
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.shutdownNoise()
    val qs = SparkEntry.queries
    names.foreach { name =>
      val fn = qs(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val times = (1 to 3).map(_ => once())
      println(f"[probe] $name%-36s min ${times.min}%7.2f s  " +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    }
    Quiet.stopNoise()
    spark.stop()
  }
}
