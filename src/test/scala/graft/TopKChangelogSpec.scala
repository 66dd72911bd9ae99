package graft

import org.apache.spark.sql.functions._
import graft.ext.TopK
import graft.sources.{Changelog, Sinks}

/** Unit tests for the round-10 lakehouse additions: skew-resistant
  * two-phase grouped top-k (ext/TopK) and the commit-partitioned
  * time-travel changelog (sources/Changelog).
  */
class TopKChangelogSpec extends SparkSpec {
  import spark.implicits._

  // ---- TopK ---------------------------------------------------------

  // deterministic, collision-rich: 3 groups × 400 rows, values repeat
  // every 37 rows so the (value desc, id) tie-break is exercised
  private def rows = spark.range(1200).select(
    (col("id") % 3).cast("string").as("g"),
    col("id").as("rid"),
    (col("id") * 31 % 37).cast("double").as("v"))

  private def plainTopK(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("rid").asc)
    rows.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  test("groupedTopK equals the single-window form for any salts/k") {
    for (salts <- Seq(1, 3, 8); k <- Seq(1, 5, 50, 1000)) {
      val got = TopK.groupedTopK(rows, Seq("g"),
          Seq(col("v").desc, col("rid").asc), k, "rid", salts)
        .select("g", "rid", "v", "rank")
        .as[(String, Long, Double, Int)].collect().sorted.toSeq
      val want = plainTopK(k).select("g", "rid", "v", "rank")
        .as[(String, Long, Double, Int)].collect().sorted.toSeq
      assert(got == want, s"salts=$salts k=$k")
      // k=1000 > group size 400: every row survives, ranks still exact
      if (k == 1000) assert(got.size == 1200)
    }
  }

  test("groupedTopK reserves its working column names loudly") {
    val bad = rows.withColumnRenamed("v", "_tk_salt")
    val e = intercept[IllegalArgumentException] {
      TopK.groupedTopK(bad, Seq("g"), Seq(col("rid")), 1, "rid", 2)
    }
    assert(e.getMessage.contains("_tk_salt"))
  }

  // ---- Changelog ----------------------------------------------------

  test("snapshotAt reads exactly the state as of each commit") {
    val path = Sinks.tmpPath("changelog_spec")
    Sinks.deleteRecursively(path)
    // commit 0: k1→a, k2→b; commit 1: k2→c (replace), k3→d (new);
    // commit 2: k1 replaced again
    Changelog.commit(Seq(("k1", "a"), ("k2", "b")).toDF("k", "v"), path, 0L)
    Changelog.commit(Seq(("k2", "c"), ("k3", "d")).toDF("k", "v"), path, 1L)
    Changelog.commit(Seq(("k1", "e")).toDF("k", "v"), path, 2L)
    def snap(v: Long) = Changelog.snapshotAt(spark, path, Seq("k"), v)
      .as[(String, String)].collect().toMap
    assert(snap(0L) == Map("k1" -> "a", "k2" -> "b"))
    assert(snap(1L) == Map("k1" -> "a", "k2" -> "c", "k3" -> "d"))
    assert(snap(2L) == Map("k1" -> "e", "k2" -> "c", "k3" -> "d"))
    assert(Changelog.snapshotLatest(spark, path, Seq("k"))
      .as[(String, String)].collect().toMap == snap(2L))
    // the snapshot never exposes the log coordinate
    assert(!snap(1L).contains(Changelog.CommitCol))
    assert(Changelog.snapshotAt(spark, path, Seq("k"), 1L)
      .columns.toSeq == Seq("k", "v"))
  }

  test("snapshotAt partition-prunes later commits out of the scan") {
    val path = Sinks.tmpPath("changelog_spec_prune")
    Sinks.deleteRecursively(path)
    Changelog.commit(Seq(("k1", "a")).toDF("k", "v"), path, 0L)
    Changelog.commit(Seq(("k1", "b")).toDF("k", "v"), path, 1L)
    val plan = Changelog.snapshotAt(spark, path, Seq("k"), 0L)
      .queryExecution.executedPlan.toString
    // the _commit <= 0 predicate must reach the scan as a PARTITION
    // filter (pruned directories), not a post-scan row filter
    assert(plan.contains("PartitionFilters") && plan.contains("_commit"),
      plan.take(2000))
  }

  test("commit refuses a delta that carries the reserved column") {
    val path = Sinks.tmpPath("changelog_spec_guard")
    Sinks.deleteRecursively(path)
    val e = intercept[IllegalArgumentException] {
      Changelog.commit(Seq(("k1", 0L)).toDF("k", Changelog.CommitCol), path, 0L)
    }
    assert(e.getMessage.contains(Changelog.CommitCol))
  }

  test("snapshotAtEvolved: added column null-fills pre-evolution rows (q143)") {
    val path = Sinks.tmpPath("changelog_spec_evo")
    Sinks.deleteRecursively(path)
    Changelog.commit(Seq(("k1", "a"), ("k2", "b")).toDF("k", "v"), path, 0L)
    // commit 1 adds column `tag` and replaces k2 only
    Changelog.commit(Seq(("k2", "c", "t1")).toDF("k", "v", "tag"), path, 1L)
    val snap = Changelog.snapshotAtEvolved(spark, path, Seq("k"), 1L)
    assert(snap.columns.sorted.toSeq == Seq("k", "tag", "v"))
    val got = snap.select("k", "v", "tag")
      .as[(String, String, Option[String])].collect().toSet
    // k1's latest version predates the evolution → null tag; k2's
    // latest carries it
    assert(got == Set(("k1", "a", None), ("k2", "c", Some("t1"))))
    // the fixed-schema read path is unaffected by the opt-in
    assert(Changelog.snapshotAt(spark, path, Seq("k"), 0L)
      .columns.toSeq == Seq("k", "v"))
  }

  test("checkpoint folds history below the horizon and vacuums it (q137)") {
    val path = Sinks.tmpPath("changelog_spec_ckpt")
    Sinks.deleteRecursively(path)
    Changelog.commit(Seq(("k1", "a"), ("k2", "b")).toDF("k", "v"), path, 0L)
    Changelog.commit(Seq(("k2", "c"), ("k3", "d")).toDF("k", "v"), path, 1L)
    Changelog.commit(Seq(("k1", "e")).toDF("k", "v"), path, 2L)
    def snap(v: Long) = Changelog.snapshotAt(spark, path, Seq("k"), v)
      .as[(String, String)].collect().toMap
    val before1 = snap(1L)
    val before2 = snap(2L)

    Changelog.checkpoint(spark, path, Seq("k"), 1L)

    def commitDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(s"${Changelog.CommitCol}="))
      .map(_.getName).sorted.toSeq
    // commit 0 vacuumed; the base now lives AS commit 1; commit 2
    // untouched; no staging residue
    assert(commitDirs == Seq(s"${Changelog.CommitCol}=1",
      s"${Changelog.CommitCol}=2"))
    assert(!new java.io.File(path).listFiles()
      .exists(_.getName.startsWith("_ckpt_staging")))
    // reads at and above the horizon are value-identical
    assert(snap(1L) == before1)
    assert(snap(2L) == before2)
    assert(Changelog.snapshotLatest(spark, path, Seq("k"))
      .as[(String, String)].collect().toMap == before2)
    // below the horizon the log no longer distinguishes states — the
    // documented retention trade
    assert(snap(0L) == Map.empty)
    // idempotent: re-checkpointing the same horizon is a no-op fold
    Changelog.checkpoint(spark, path, Seq("k"), 1L)
    assert(snap(2L) == before2)
  }

  test("checkpoint folds evolved schemas losslessly and lands the base " +
    "before vacuuming") {
    val path = Sinks.tmpPath("changelog_spec_ckpt_evo")
    Sinks.deleteRecursively(path)
    Changelog.commit(Seq(("k1", "a"), ("k2", "b")).toDF("k", "v"), path, 0L)
    // commit 1 ADDS column `tag` — the fold must read with mergeSchema
    // or this column (and k2's only surviving value for it) would be
    // silently dropped, then vacuumed out of existence
    Changelog.commit(Seq(("k2", "c", "t1")).toDF("k", "v", "tag"), path, 1L)
    Changelog.checkpoint(spark, path, Seq("k"), 1L)
    val base = Changelog.snapshotAtEvolved(spark, path, Seq("k"), 1L)
    assert(base.columns.sorted.toSeq == Seq("k", "tag", "v"))
    assert(base.select("k", "v", "tag")
      .as[(String, String, Option[String])].collect().toSet ==
      Set(("k1", "a", None), ("k2", "c", Some("t1"))))
    // only the base commit remains; no staging residue beside the log
    val dirs = new java.io.File(path).listFiles().map(_.getName).toSeq
    assert(dirs.filter(_.startsWith(s"${Changelog.CommitCol}=")) ==
      Seq(s"${Changelog.CommitCol}=1"))
    assert(!new java.io.File(path).getParentFile.listFiles()
      .exists(_.getName.contains("changelog_spec_ckpt_evo__ckpt_staging")))
  }

  test("changesBetween: insert/update labels, no-op suppression, tracked scoping") {
    val path = Sinks.tmpPath("changelog_spec_cdf")
    Sinks.deleteRecursively(path)
    // c0: k1..k4; c1: k2 value changed, k3 rewritten IDENTICALLY,
    // k4 only the untracked note changed, k5 new
    Changelog.commit(Seq(
      ("k1", 10.0, "a"), ("k2", 20.0, "a"), ("k3", 30.0, "a"),
      ("k4", 40.0, "a")).toDF("k", "v", "note"), path, 0L)
    Changelog.commit(Seq(
      ("k2", 21.0, "a"), ("k3", 30.0, "a"), ("k4", 40.0, "b"),
      ("k5", 50.0, "a")).toDF("k", "v", "note"), path, 1L)
    val feed = Changelog.changesBetween(spark, path, Seq("k"), 0L, 1L,
        trackCols = Seq("v"))
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[String]("change_type"), r.getAs[Any]("old_v"),
          r.getAs[Any]("new_v")))).toMap
    // k1 untouched (not a candidate), k3 identical + k4 untracked-only
    // change both suppressed; k2 update, k5 insert
    assert(feed == Map(
      "k2" -> (("update", 20.0, 21.0)),
      "k5" -> (("insert", null, 50.0))))
    // whole-row tracking surfaces k4's note flip too
    val full = Changelog.changesBetween(spark, path, Seq("k"), 0L, 1L,
        trackCols = Seq("v", "note"))
      .collect().map(r => r.getAs[String]("k") ->
        r.getAs[String]("change_type")).toMap
    assert(full == Map("k2" -> "update", "k4" -> "update",
      "k5" -> "insert"))
    intercept[IllegalArgumentException](
      Changelog.changesBetween(spark, path, Seq("k"), 1L, 1L, Seq("v")))
  }
}
