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

  /** Guard for identifiers that must be INTERPOLATED into SQL text
    * (table/column names in DDL and DML — JDBC parameters cannot bind
    * identifiers, only values). Everything else in this module binds
    * through PreparedStatement parameters; identifiers pass through
    * this allowlist so a quote, space, or any other metacharacter in a
    * caller-supplied name fails loudly instead of breaking (or
    * injecting into) the statement.
    */
  private def checkedIdent(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"SQL identifier '$name' is not a plain [A-Za-z0-9_] name — " +
        "refusing to interpolate it into a statement")
    name
  }

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
        s"""SELECT MIN("${checkedIdent(colName)}"), MAX("${checkedIdent(colName)}") FROM ${checkedIdent(table)}""")
      rs.next()
      (rs.getLong(1), rs.getLong(2))
    } finally conn.close()
  }

  /** Exactly-once micro-batch append into a JDBC warehouse — the
    * committed-batchId ledger StreamIvm's scaladoc names as the
    * foreachBatch discipline a JDBC sink needs (Structured Streaming
    * redelivers a batch after a mid-batch crash; a naive append would
    * double-insert). The industry-standard two-phase shape:
    *
    *  1. SKIP if the ledger already holds (table, batchId) — the batch
    *     fully published before a prior crash;
    *  2. STAGE the batch into its own `<table>_STAGE_<id>` table via
    *     parallel `write.jdbc` overwrite — re-runnable: a retry
    *     overwrites any partial earlier staging, and parallelism stays
    *     on the Spark side where it belongs;
    *  3. PUBLISH in ONE driver-side RDBMS transaction: `INSERT INTO
    *     target SELECT * FROM stage` + the ledger row, COMMIT — the
    *     rows and the fact-of-publication land atomically (this is
    *     what the warehouse's ACID is FOR; Spark supplies the batchId,
    *     the RDBMS supplies the atomicity).
    *
    * Every crash point replays safely: before COMMIT the target has no
    * rows from this batch and the ledger no entry (redo stages +
    * publishes); after COMMIT the ledger entry makes the redo a no-op.
    * The staging DROP after commit is cosmetic cleanup — an orphaned
    * stage table is dead weight, never wrong data. Even two CONCURRENT
    * publishers of the same batch (which Structured Streaming never
    * produces, but a zombie driver could) cannot double-insert: the
    * ledger's PRIMARY KEY rejects the second publish's ledger row
    * INSIDE its transaction, the exception aborts before COMMIT, and
    * closing the non-autocommit connection rolls the rows back.
    *
    * Scale: staging writes are `numPartitions` parallel connections;
    * the publish INSERT..SELECT runs entirely inside the warehouse
    * (no rows cross back through the driver); the ledger is one row
    * per batch. On MySQL the same code path holds (InnoDB
    * transactions); only the URL changes.
    */
  def appendBatchExactlyOnce(batch: DataFrame, dbDir: String,
                             table: String, batchId: Long,
                             columnTypes: Option[String] = None,
                             numPartitions: Int = 4): Unit = {
    derbyHome
    val tbl = checkedIdent(table)
    val conn = DriverManager.getConnection(url(dbDir))
    try {
      execIgnoringExisting(conn,
        """CREATE TABLE GRAFT_BATCH_LEDGER (
          |  TBL VARCHAR(128) NOT NULL, BATCH_ID BIGINT NOT NULL,
          |  PRIMARY KEY (TBL, BATCH_ID))""".stripMargin)
      // ledger VALUES bind as parameters — never interpolated, the
      // same injection-safe discipline as q175's parameterized SQL
      val ps = conn.prepareStatement(
        "SELECT COUNT(*) FROM GRAFT_BATCH_LEDGER WHERE TBL = ? AND BATCH_ID = ?")
      ps.setString(1, tbl)
      ps.setLong(2, batchId)
      val rs = ps.executeQuery()
      rs.next()
      if (rs.getInt(1) > 0) return // already published atomically
    } finally conn.close()

    val stage = checkedIdent(s"${tbl}_STAGE_$batchId")
    val w = batch.write.mode("overwrite")
      .option("numPartitions", numPartitions)
      .option("batchsize", 1000)
    columnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.jdbc(url(dbDir), stage, props)

    val pub = DriverManager.getConnection(url(dbDir))
    try {
      execIgnoringExisting(pub,
        s"CREATE TABLE $tbl AS SELECT * FROM $stage WITH NO DATA")
      pub.setAutoCommit(false)
      val st = pub.createStatement()
      st.executeUpdate(s"INSERT INTO $tbl SELECT * FROM $stage")
      val ins = pub.prepareStatement(
        "INSERT INTO GRAFT_BATCH_LEDGER VALUES (?, ?)")
      ins.setString(1, tbl)
      ins.setLong(2, batchId)
      ins.executeUpdate()
      pub.commit()
      pub.setAutoCommit(true)
      // Cosmetic cleanup only — the publish is already committed. A
      // failed DROP must not fail the streaming batch (which would
      // force a spurious restart the ledger then no-ops): an orphaned
      // stage table is dead weight, never wrong data.
      try st.executeUpdate(s"DROP TABLE $stage"): Unit
      catch {
        case e: java.sql.SQLException =>
          System.err.println(
            s"[JdbcStore] post-commit DROP of stage table $stage failed " +
              s"(${e.getSQLState}); orphaned stage left behind: ${e.getMessage}")
      }
    } finally pub.close()
  }

  /** COUNT(*) read driver-side over plain JDBC — the O(1)-row probe
    * the redelivery proof uses (the RDBMS counts; no Spark scan).
    */
  def tableCount(dbDir: String, table: String): Long = {
    derbyHome
    val conn = DriverManager.getConnection(url(dbDir))
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT COUNT(*) FROM ${checkedIdent(table)}")
      rs.next()
      rs.getLong(1)
    } finally conn.close()
  }

  /** Drop `table` and forget its ledger rows — the re-runnable fixture
    * reset for [[appendBatchExactlyOnce]] targets: a rerun must replay
    * the whole delivery story from batch 0, which a stale ledger would
    * silently skip. Swallows only does-not-exist errors (first run).
    */
  def resetExactlyOnceTarget(dbDir: String, table: String): Unit = {
    derbyHome
    val conn = DriverManager.getConnection(url(dbDir))
    try {
      val tbl = checkedIdent(table)
      execIgnoringMissing(conn, s"DROP TABLE $tbl")
      // parameterized TBL value (missing-ledger first run swallowed)
      try {
        val ps = conn.prepareStatement(
          "DELETE FROM GRAFT_BATCH_LEDGER WHERE TBL = ?")
        ps.setString(1, tbl)
        ps.executeUpdate(): Unit
      } catch {
        case e: java.sql.SQLException
          if e.getSQLState == "42Y55" || e.getSQLState == "42X05" => ()
      }
    } finally conn.close()
  }

  /** Run DDL, swallowing only Derby's already-exists error (X0Y32) —
    * the CREATE TABLE IF NOT EXISTS Derby lacks.
    */
  private def execIgnoringExisting(conn: java.sql.Connection,
                                   ddl: String): Unit =
    try { conn.createStatement().executeUpdate(ddl): Unit }
    catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
    }

  /** Run a statement, swallowing only Derby's object-missing errors
    * (42Y55 = DROP on a missing table, 42X05 = DML on a missing table)
    * — the DROP TABLE IF EXISTS Derby lacks.
    */
  private def execIgnoringMissing(conn: java.sql.Connection,
                                  sql: String): Unit =
    try { conn.createStatement().executeUpdate(sql): Unit }
    catch {
      case e: java.sql.SQLException
        if e.getSQLState == "42Y55" || e.getSQLState == "42X05" => ()
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
