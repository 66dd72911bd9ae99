package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.sources.{JdbcStore, Sinks}

class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (1L to 100L).map { i =>
    (i, i % 7, s"s$i", 1000.0 + i, Timestamp.valueOf(s"2025-01-01 00:00:0${i % 10}.00012${i % 10}"))
  }.toDF("k", "grp", "name", "price", "ts")

  test("write.jdbc + partitioned read.jdbc round-trips values exactly") {
    val db = Sinks.tmpPath("jdbc_spec_rt")
    JdbcStore.writeTable(fixture, db, "facts",
      columnTypes = Some("name VARCHAR(32)"))
    val back = JdbcStore.readPartitioned(spark, db, "facts", "k", 4)
    assert(back.columns.toSeq == fixture.columns.toSeq)
    val a = fixture.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b) // µs timestamp precision included
  }

  test("partitioned read plans >1 input partition and pushes predicates") {
    val db = Sinks.tmpPath("jdbc_spec_push")
    JdbcStore.writeTable(fixture, db, "facts")
    val back = JdbcStore.readPartitioned(spark, db, "facts", "k", 4)
    assert(back.rdd.getNumPartitions == 4,
      "range-strided JDBC scan must fan out, not read on one connection")
    val filtered = back.filter(col("price") > 1050.0 && col("grp") === 3L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(price,1050.0)") &&
      plan.contains("EqualTo(grp,3)"),
      s"filters must reach the JDBC scan's WHERE clause, plan was:\n$plan")
    assert(filtered.count() ==
      fixture.filter(col("price") > 1050.0 && col("grp") === 3L).count())
  }

  test("overwrite is idempotent (rerun replaces, never duplicates)") {
    val db = Sinks.tmpPath("jdbc_spec_idem")
    JdbcStore.writeTable(fixture, db, "facts")
    JdbcStore.writeTable(fixture, db, "facts")
    assert(JdbcStore.readPartitioned(spark, db, "facts", "k", 2)
      .count() == 100L)
  }

  test("appendBatchExactlyOnce absorbs redelivery and partial staging") {
    val db = Sinks.tmpPath("jdbc_spec_eo")
    val tbl = "EO_FACTS"
    val types = Some("name VARCHAR(32)")
    def batch(i: Long) = fixture.filter(col("grp") === i)
    JdbcStore.resetExactlyOnceTarget(db, tbl)

    // crash-during-staging leg: a partial garbage attempt at batch 1's
    // stage table (rows not in the real batch) must be clobbered
    JdbcStore.writeTable(
      batch(1L).limit(2).withColumn("k", col("k") + 100000L),
      db, s"${tbl}_STAGE_1", types)

    JdbcStore.appendBatchExactlyOnce(batch(0L), db, tbl, 0L, types)
    JdbcStore.appendBatchExactlyOnce(batch(1L), db, tbl, 1L, types)
    val n = JdbcStore.tableCount(db, tbl)
    assert(n == batch(0L).count() + batch(1L).count())

    // crash-after-commit leg: redelivering both batches must no-op
    JdbcStore.appendBatchExactlyOnce(batch(0L), db, tbl, 0L, types)
    JdbcStore.appendBatchExactlyOnce(batch(1L), db, tbl, 1L, types)
    assert(JdbcStore.tableCount(db, tbl) == n)

    // content exactness: poisoned stage rows must not have survived
    val back = JdbcStore.readPartitioned(spark, db, tbl, "k", 2)
    val want = batch(0L).unionByName(batch(1L))
      .collect().map(_.toSeq).toSet
    assert(back.collect().map(_.toSeq).toSet == want)

    // rerun reset: a fresh delivery story replays from batch 0
    JdbcStore.resetExactlyOnceTarget(db, tbl)
    JdbcStore.appendBatchExactlyOnce(batch(0L), db, tbl, 0L, types)
    assert(JdbcStore.tableCount(db, tbl) == batch(0L).count())
  }

  test("exactly-once JDBC sink stream resumes from its checkpoint across a restart") {
    // the q159 shape's restart leg: land two files, let AvailableNow
    // terminate, land two more, START A NEW QUERY on the same
    // checkpoint — the source's committed offsets must skip the
    // applied files and the batch counter must CONTINUE (ledger ids
    // 2, 3 — a reset-to-0 restart would hit the ledger and silently
    // DROP the new files' rows), so the warehouse holds each row once.
    import org.apache.spark.sql.streaming.Trigger
    val db = Sinks.tmpPath("jdbc_spec_restart_db")
    val landing = Sinks.tmpPath("jdbc_spec_restart_in")
    val ckpt = Sinks.tmpPath("jdbc_spec_restart_ckpt")
    Seq(landing, ckpt).foreach(Sinks.deleteRecursively)
    val tbl = "RESTART_FACTS"
    JdbcStore.resetExactlyOnceTarget(db, tbl)

    def parts() = Option(new java.io.File(landing).listFiles()).fold(
      Set.empty[java.io.File])(_.filter(_.getName.endsWith(".parquet")).toSet)
    var mtime = System.currentTimeMillis() - 10000
    def land(lo: Long, hi: Long): Unit = {
      val before = parts()
      spark.range(lo, hi).select(col("id").as("k"),
          (col("id") * 3).as("v"))
        .coalesce(1).write.mode("append").parquet(landing)
      (parts() -- before).foreach(_.setLastModified(mtime))
      mtime += 2000
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("v", "long")
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(landing)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, id: Long) =>
            JdbcStore.appendBatchExactlyOnce(b, db, tbl, id)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    land(0L, 100L); land(100L, 200L)
    run()
    assert(JdbcStore.tableCount(db, tbl) == 200L)
    land(200L, 300L); land(300L, 400L)
    run() // restart on the SAME checkpoint: batchIds continue at 2, 3
    assert(JdbcStore.tableCount(db, tbl) == 400L)
    val back = JdbcStore.readPartitioned(spark, db, tbl, "k", 2)
    assert(back.agg(sum(col("v"))).head().getLong(0) ==
      (0L until 400L).map(_ * 3).sum) // every row exactly once
  }

  test("v2 jdbc catalog pushes aggregates, group-by, and filters down") {
    val db = Sinks.tmpPath("jdbc_spec_cat")
    JdbcStore.writeTable(fixture, db, "facts")
    spark.conf.set("spark.sql.catalog.derbyspec",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.derbyspec.url", JdbcStore.url(db))
    spark.conf.set("spark.sql.catalog.derbyspec.driver",
      "org.apache.derby.jdbc.EmbeddedDriver")
    spark.conf.set("spark.sql.catalog.derbyspec.pushDownAggregate", "true")
    // unquoted DDL names uppercase in Derby: the catalog lists FACTS
    val agg = spark.sql(
      """SELECT grp, COUNT(*) AS n, MAX(k) AS max_k
        |FROM derbyspec.APP.FACTS WHERE k > 10 GROUP BY grp""".stripMargin)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*), MAX(k)]"),
      s"aggregate must run inside the warehouse, plan was:\n$plan")
    assert(plan.contains("PushedGroupByExpressions: [grp]"), plan)
    assert(plan.contains("k > 10"), s"filter must push, plan was:\n$plan")
    val got = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = fixture.filter(col("k") > 10).groupBy("grp")
      .agg(count(lit(1)).as("n"), max("k").as("max_k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("interpolated identifiers are allowlisted — a metacharacter name " +
       "is refused before any SQL runs (round-12 ADVICE: ledger values " +
       "now bind as PreparedStatement parameters; identifiers, which " +
       "JDBC cannot bind, pass a loud [A-Za-z0-9_] gate)") {
    val db = Sinks.tmpPath("jdbc_spec_ident")
    for (bad <- Seq("t'; DROP TABLE x--", "t\"q", "t name", "1tbl", "")) {
      intercept[IllegalArgumentException](JdbcStore.tableCount(db, bad))
      intercept[IllegalArgumentException](JdbcStore.bounds(db, bad, "k"))
      intercept[IllegalArgumentException](
        JdbcStore.appendBatchExactlyOnce(fixture, db, bad, 0L))
      intercept[IllegalArgumentException](
        JdbcStore.resetExactlyOnceTarget(db, bad))
    }
    intercept[IllegalArgumentException](
      JdbcStore.bounds(db, "facts", """k" FROM x; --"""))
  }
}
