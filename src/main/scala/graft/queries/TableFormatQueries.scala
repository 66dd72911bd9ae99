package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Changelog, GraftLog, GraftLogCatalog, Sinks}

/** Table-format interface pack (round 15): the changelog's BATCH DSv2
  * read surface — `spark.read.format(GraftLog)` with versionAsOf /
  * timestampAsOf / readChangeFeed options, catalog registration with
  * SQL `VERSION AS OF` / `TIMESTAMP AS OF`, and the filter-driven
  * commit-stats skipping with its structural plan proof. Each query
  * reaches a law already oracle-proven through the LIBRARY calls
  * (q181/q182/q190's oracles verbatim where the law is shared), so a
  * hash mismatch here isolates the INTERFACE, never the engine.
  */
object TableFormatQueries {

  private def fmt = classOf[GraftLog].getName

  /** q215's skipping subject: an ops log whose commits hold DISJOINT
    * o_orderkey ranges — commit 0 the lower half, commit 1 the upper
    * half, commit 2 a +100 update of the lowest quarter — with stats
    * markers on every commit, so a high-key probe admits exactly one
    * directory. Returns (path, maxKey).
    */
  private def disjointOpsLog(s: SparkSession, d: String): (String, Long) = {
    val path = Sinks.tmpPathFor("orders_ops_log_q215", d)
    Sinks.deleteRecursively(path)
    val o = AuditQueries.opsOrders(s, d)
    val m = o.agg(max(col("o_orderkey"))).head().getLong(0)
    val k = col("o_orderkey")
    Changelog.commitUpsert(o.filter(k <= m / 2), path, 0L)
    Changelog.commitUpsert(o.filter(k > m / 2), path, 1L)
    Changelog.commitUpsert(
      o.filter(k <= m / 4)
        .withColumn("o_totalprice", col("o_totalprice") + 100.0),
      path, 2L)
    for (c <- 0L to 2L) Changelog.writeCommitStats(s, path, c, "o_orderkey")
    (path, m)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // THE CHANGELOG AS A BATCH DSv2 TABLE — the interface gap round 14
    // left: `spark.read.format(GraftLog).option("versionAsOf", 2)` over
    // the three-commit ops log, resolving through the engine's own
    // snapshot plan via the pre-CBO rule (the merge-on-read discipline:
    // the table IS its plan — EXPLAIN shows the _commit partition
    // filters and the max_by compaction, not an opaque scan). Must
    // equal the library read exactly — q181's oracle verbatim.
    "q211_log_table_snapshot" -> ((s, d) =>
      s.read.format(fmt)
        .option("path", AuditQueries.opsLog(s, d, "orders_ops_log_q211"))
        .option("keys", "o_orderkey")
        .option("versionAsOf", 2)
        .load()),

    // SQL TIME TRAVEL through the session catalog — `SELECT … FROM
    // glog.t VERSION AS OF 2` lands on TableCatalog.loadTable(ident,
    // version) (Spark's own DSv2 time-travel contract) and resolves
    // through the same rule: the q181 state reached through a PURE SQL
    // STRING, table registration being three session-conf keys (the
    // q156 catalog discipline — configuration, not a metastore).
    "q212_log_table_sql_version" -> ((s, d) => {
      val path = AuditQueries.opsLog(s, d, "orders_ops_log_q212")
      GraftLogCatalog.register(s, "glog", "orders_ops_q212", path,
        Seq("o_orderkey"))
      s.sql("SELECT * FROM glog.orders_ops_q212 VERSION AS OF 2")
    }),

    // SQL `TIMESTAMP AS OF` — the clock half of the q212 surface, on
    // q190's stamped plain log (commits stamped 1000/2000/3000 epoch
    // millis): the SQL literal evaluates to epoch micros, the catalog
    // converts to the stamp clock, versionAtTimestamp resolves the
    // latest commit ≤ 2500 — commit 2, already in the log but stamped
    // 3000, must not leak. q190's oracle verbatim, reached through
    // Spark's parser instead of the library call.
    "q213_log_table_sql_timestamp" -> ((s, d) => {
      val path = Sinks.tmpPathFor("orders_ts_log_q213", d)
      Sinks.deleteRecursively(path)
      val o = AuditQueries.opsOrders(s, d)
      val k = col("o_orderkey")
      Changelog.commitStamped(o.filter(k % 4 =!= 3), path, 0L, 1000L)
      Changelog.commitStamped(
        o.filter(k % 4 =!= 3 && k % 7 === 1)
          .withColumn("o_totalprice", col("o_totalprice") + 500.0),
        path, 1L, 2000L)
      Changelog.commitStamped(o.filter(k % 4 === 3), path, 2L, 3000L)
      GraftLogCatalog.register(s, "glog", "orders_ts_q213", path,
        Seq("o_orderkey"))
      s.sql("SELECT * FROM glog.orders_ts_q213 " +
        "TIMESTAMP AS OF '1970-01-01 00:00:02.5'")
    }),

    // CHANGE FEED through the batch table — `readChangeFeed=true` with
    // startingVersion/endingVersion resolves to changesBetweenOps's
    // full-label feed (insert/update/delete, net semantics, no-op
    // suppression): q182's oracle verbatim through the reader options.
    "q214_log_table_cdf" -> ((s, d) =>
      s.read.format(fmt)
        .option("path", AuditQueries.opsLog(s, d, "orders_ops_log_q214"))
        .option("keys", "o_orderkey")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0).option("endingVersion", 2)
        .option("trackCols", "o_totalprice")
        .load()),

    // FILTER-DRIVEN COMMIT SKIPPING ON THE TABLE SURFACE — the pushed
    // key predicate routes the relation through rangeLookupOps, so the
    // commit-stats index prunes whole commit directories DRIVER-SIDE:
    // on a log whose commits hold disjoint key ranges, the probe
    // `o_orderkey > 3m/4` must read ONLY `_commit=1` — proven
    // structurally (df.inputFiles) before the values are returned,
    // because an oracle can see the rows but never which directories
    // were opened. The require() is the plan proof the q201 payload
    // counter established as the discipline.
    "q215_log_table_skipping" -> ((s, d) => {
      val (path, m) = disjointOpsLog(s, d)
      val t = 3L * m / 4L
      val df = s.read.format(fmt)
        .option("path", path).option("keys", "o_orderkey")
        .option("versionAsOf", 2)
        .load()
        .filter(col("o_orderkey") > t)
      val dirs = df.inputFiles.map(f =>
        f.split("/").find(_.startsWith(s"${Changelog.CommitCol}="))
          .getOrElse("?")).distinct.sorted
      require(dirs.toSeq == Seq(s"${Changelog.CommitCol}=1"),
        s"stats skipping must admit exactly _commit=1 for the probe " +
          s"(> $t of max $m), but the scan reads [${dirs.mkString(", ")}]")
      df
    }))

  val oracles: Map[String, String] = Map(

    // q181's live-state law verbatim — the batch table serves the same
    // snapshot the library does
    "q211_log_table_snapshot" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 20 = 0 THEN o_totalprice + 1000.0
        |       WHEN o_orderkey % 4 <> 3 AND o_orderkey % 10 <> 0
        |            AND o_orderkey % 7 = 1 THEN o_totalprice + 500.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |WHERE o_orderkey % 4 = 3
        |   OR o_orderkey % 10 <> 0
        |   OR o_orderkey % 20 = 0""".stripMargin,

    // same law through the SQL VERSION AS OF clause
    "q212_log_table_sql_version" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 20 = 0 THEN o_totalprice + 1000.0
        |       WHEN o_orderkey % 4 <> 3 AND o_orderkey % 10 <> 0
        |            AND o_orderkey % 7 = 1 THEN o_totalprice + 500.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |WHERE o_orderkey % 4 = 3
        |   OR o_orderkey % 10 <> 0
        |   OR o_orderkey % 20 = 0""".stripMargin,

    // q190's as-of-2500 law verbatim through TIMESTAMP AS OF
    "q213_log_table_sql_timestamp" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 7 = 1 THEN o_totalprice + 500.0
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders
        |WHERE o_orderkey % 4 <> 3""".stripMargin,

    // q182's full-label net feed verbatim through the reader options:
    // inserts (the held-out tail + resurrections collapse), updates
    // (mod-7 branch), deletes (tombstoned non-resurrected 10ths,
    // olds carried), no-ops suppressed
    "q214_log_table_cdf" ->
      """SELECT o_orderkey, 'delete' AS change_type,
        |  o_totalprice AS old_o_totalprice,
        |  CAST(NULL AS DOUBLE) AS new_o_totalprice
        |FROM orders
        |WHERE o_orderkey % 4 <> 3 AND o_orderkey % 10 = 0
        |  AND o_orderkey % 20 <> 0
        |UNION ALL
        |SELECT o_orderkey, 'update', o_totalprice,
        |  o_totalprice + 1000.0
        |FROM orders WHERE o_orderkey % 20 = 0
        |UNION ALL
        |SELECT o_orderkey, 'update', o_totalprice,
        |  o_totalprice + 500.0
        |FROM orders
        |WHERE o_orderkey % 4 <> 3 AND o_orderkey % 10 <> 0
        |  AND o_orderkey % 7 = 1
        |UNION ALL
        |SELECT o_orderkey, 'insert', CAST(NULL AS DOUBLE),
        |  o_totalprice
        |FROM orders WHERE o_orderkey % 4 = 3""".stripMargin,

    // the upper-quarter slice at base prices (commit 1 never updated)
    "q215_log_table_skipping" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey > (SELECT 3 * max(o_orderkey) // 4 FROM orders)"""
        .stripMargin)
}
