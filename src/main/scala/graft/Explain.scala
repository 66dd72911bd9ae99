package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one named query
  * (or `entry`) so shuffle/pushdown/codegen shape can be audited.
  * Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("entry")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df =
      if (name == "entry") SparkEntry.entry(spark)
      else SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val plan = df.queryExecution.executedPlan.toString
    println(s"[explain] from_json occurrences: " +
      "from_json".r.findAllIn(plan).length)
    spark.stop()
  }
}
