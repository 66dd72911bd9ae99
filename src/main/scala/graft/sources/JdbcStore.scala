package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC storage interface — the reference's primary persistence layer
  * (MySQL via mysql-connector: `details.py:207–227` appends the scraped
  * details table, `Financilas.py:167–184` upserts fact rows,
  * `Summary.py:77–89` reads points back). This module exercises the
  * SAME Spark interface a production deployment would use against that
  * MySQL endpoint — `df.write.jdbc` batched parallel ingest and
  * `spark.read.jdbc` with `partitionColumn`/bounds/`numPartitions`
  * plus predicate pushdown — backed here by the EMBEDDED Derby engine
  * shipped with Spark (the only RDBMS available in a zero-egress
  * sandbox).
  *
  * Scale contract (what carries to the cluster, and what does not):
  *  - the WRITE path opens `numPartitions` parallel connections, each
  *    streaming its partition in `batchsize`d inserts — exactly how a
  *    1000-executor job feeds a warehouse; Spark caps the fan-in so
  *    the RDBMS is not hit by one connection per task;
  *  - the READ path turns the table into `numPartitions` range-strided
  *    scans on `partitionColumn` (each executor issues `WHERE pc >= lo
  *    AND pc < hi`), and Catalyst pushes filters into each scan's SQL
  *    — the table never materializes on one machine;
  *  - embedded Derby itself is single-node BY DESIGN (the db lives in
  *    a local directory); in production only the URL changes. Keeping
  *    the interface identical is the point: a migrating user swaps
  *    `jdbc:derby:…` for `jdbc:mysql:…` and every option keeps its
  *    meaning.
  */
object JdbcStore {

  /** Boot-once Derby housekeeping: derby.log goes to the PID-scoped
    * scratch root, never the working directory.
    */
  private lazy val derbyHome: Unit = {
    val home = Sinks.tmpPath("derby_home")
    new java.io.File(home).mkdirs()
    sys.props.getOrElseUpdate("derby.system.home", home)
  }

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  def url(dbDir: String): String = { derbyHome; s"jdbc:derby:$dbDir;create=true" }

  private def props: Properties = {
    val p = new Properties()
    // Derby 10.15+ ships EmbeddedDriver in derbytools.jar (on the
    // Spark classpath alongside the engine and shared jars).
    p.setProperty("driver", Driver)
    p
  }

  /** CREATE-and-load `table` from `df` (drop-and-recreate on rerun —
    * the idempotent fixture form of the reference's CREATE TABLE IF
    * NOT EXISTS + append). `columnTypes` overrides the dialect's
    * default DDL mapping (Derby would map StringType to CLOB; real
    * deployments declare VARCHAR widths, as the reference's DDL does).
    */
  def writeTable(df: DataFrame, dbDir: String, table: String,
                 columnTypes: Option[String] = None,
                 numPartitions: Int = 4): Unit = {
    val w = df.write.mode("overwrite")
      .option("numPartitions", numPartitions)
      .option("batchsize", 1000)
    columnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.jdbc(url(dbDir), table, props)
  }

  /** MIN/MAX of a numeric column, read driver-side over plain JDBC —
    * the O(1)-row metadata probe that seeds the partitioned read's
    * bounds (a production job gets these from the warehouse catalog or
    * a watermark table; either way it is one row, never a table scan
    * driver-side).
    */
  def bounds(dbDir: String, table: String, colName: String): (Long, Long) = {
    derbyHome
    val conn = DriverManager.getConnection(url(dbDir))
    try {
      val rs = conn.createStatement().executeQuery(
        s"""SELECT MIN("$colName"), MAX("$colName") FROM $table""")
      rs.next()
      (rs.getLong(1), rs.getLong(2))
    } finally conn.close()
  }

  /** The table as `numPartitions` parallel range-strided JDBC scans on
    * `partitionColumn`. Filters applied on the returned frame are
    * pushed into each scan's WHERE clause by Catalyst (assert:
    * `PushedFilters` in the plan) — the RDBMS prunes before a row
    * crosses the wire.
    */
  def readPartitioned(spark: SparkSession, dbDir: String, table: String,
                      partitionColumn: String,
                      numPartitions: Int): DataFrame = {
    val (lo, hi) = bounds(dbDir, table, partitionColumn)
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lo)
      .option("upperBound", hi + 1) // upperBound is exclusive stride math
      .option("numPartitions", numPartitions)
      .jdbc(url(dbDir), table, props)
  }
}
