package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.transform.Upsert

/** Versioned keyed changelog with time travel — "read the table AS OF
  * commit v". The table is a commit-partitioned parquet changelog: each
  * commit APPENDS its delta rows stamped with a monotonically
  * increasing commit id (the transaction-log discipline of a lakehouse
  * table format, reduced to its queryable core), and a snapshot at any
  * commit is the keyed last-write-wins compaction of all commits up to
  * it. Nothing is ever rewritten in place, so every historical snapshot
  * stays readable forever — the audit/reproducibility property
  * ("exactly what did the model train on at release 12?") that an
  * overwrite-in-place upsert destroys.
  *
  * Scale:
  *  - a commit is O(delta): one append of the delta rows into a new
  *    `_commit=<v>` partition directory — no read, no merge, no lock
  *    window beyond the atomic directory add;
  *  - `snapshotAt` PARTITION-PRUNES to commits ≤ v (the `_commit <=
  *    v` filter is a partition filter — later commits are never read),
  *    then compacts via [[Upsert.latestByKey]]'s `max_by` aggregate:
  *    one shuffle on the key with map-side partial combine, no sort,
  *    AQE-splittable — the same kernel the streaming changelog sinks
  *    compact with;
  *  - history growth is bounded operationally by checkpointing: fold
  *    commits ≤ v into a new base commit (itself just `snapshotAt(v)`
  *    committed as v's replacement) and drop the olds — same math as
  *    the streaming compaction, deliberately not automated here.
  */
object Changelog {

  val CommitCol = "_commit"

  // ---- Checkpoint horizon -------------------------------------------
  //
  // `checkpoint`/`checkpointOps` ERASE history below the fold version.
  // A snapshot below the horizon would read empty, and — worse — a
  // change feed whose v0 sits below the horizon would see stateAt(v0)
  // as empty and label EVERY surviving key `insert` with null olds,
  // silently double-counting in any CDF-driven maintenance consumer
  // (the q169/q183 contract). The horizon is therefore recorded in a
  // `_graft_horizon` marker file (underscore-prefixed: Spark's file
  // index skips it) written AFTER the folded base lands and BEFORE the
  // vacuum destroys anything, and every versioned read fails loudly
  // below it. A marker — not the min commit-dir id — because a fresh
  // log whose first commit id is c0 > 0 legitimately has empty state
  // below c0 (nothing ever existed), while below a checkpoint horizon
  // state DID exist and was folded away; only the marker can tell the
  // two apart.

  private val HorizonMarker = "_graft_horizon"

  // All marker/listing side-effects go through the Hadoop FileSystem
  // API (LogFs) — resolved from the path itself, so the time-travel /
  // retention / skipping machinery works unchanged on file:/ URIs,
  // HDFS, and S3-style stores, not just bare local paths. Spark's own
  // parquet IO always did; the metadata now matches it.

  private def horizonPath(path: String): String =
    LogFs.child(path, HorizonMarker)

  /** The log's checkpoint horizon: versioned reads below this fail
    * loudly. `Long.MinValue` for a never-checkpointed log.
    */
  def horizonOf(path: String): Long = {
    val p = horizonPath(path)
    if (!LogFs.exists(p)) Long.MinValue
    else LogFs.readString(p).trim.toLong
  }

  /** Record horizon `v` (monotonic max; atomic rename so a torn write
    * can never produce a silently-wrong horizon).
    */
  private def writeHorizon(path: String, v: Long): Unit = {
    if (v > horizonOf(path)) {
      LogFs.writeAtomic(horizonPath(path), v.toString)
    }
  }

  private def requireAboveHorizon(path: String, v: Long, what: String): Unit = {
    val h = horizonOf(path)
    require(v >= h,
      s"$what $v is below the checkpoint horizon $h of $path — history " +
        "below the horizon was folded away; a snapshot there would read " +
        "empty and a change feed would mislabel every surviving key as " +
        "insert. Re-base the reader at or above the horizon.")
  }

  // ---- Commit timestamps: AS OF TIMESTAMP ---------------------------
  //
  // Commit ids order the log; TIMESTAMPS are how consumers address it
  // ("the table as of last night 02:00"). Every lakehouse format maps
  // AS OF TIMESTAMP onto the commit sequence the same way: resolve the
  // LATEST commit whose timestamp is <= the requested instant, then
  // read that version. Timestamps here are CALLER-PROVIDED (the
  // ingest's own clock — reproducible and testable, where a wall-clock
  // stamp would make every run a different table), recorded as one
  // `_graft_ts_<commitId>` marker file per commit (underscore-prefixed
  // so Spark's file index skips them; atomic rename so a torn write
  // can never mis-resolve), and REQUIRED non-decreasing in commit-id
  // order — an out-of-order stamp would make "as of t" ambiguous, so
  // the write fails loudly instead. Stamps are immutable: re-stamping
  // with the same value is an idempotent no-op (the retry contract),
  // a different value is refused. Checkpoints keep stamps intact —
  // the folded base at v still answers "as of" any instant in
  // [ts(v), next stamp), and an instant that resolves BELOW the
  // horizon fails through the same loud horizon guard as a versioned
  // read (retention applies to clock addressing too, never silently).

  private val TsPrefix = "_graft_ts_"

  /** All recorded (commitId, tsMillis) stamps, commit-id ascending. */
  def commitTimestamps(path: String): Seq[(Long, Long)] =
    LogFs.list(path)
      .filter(s => s.isFile && s.getPath.getName.startsWith(TsPrefix))
      .map { s =>
        (s.getPath.getName.stripPrefix(TsPrefix).toLong,
          LogFs.readString(s.getPath.toString).trim.toLong)
      }.sortBy(_._1)

  /** Record commit `commitId`'s timestamp. Must stamp an EXISTING
    * commit (stamp after the commit lands — a stamp for data that
    * never arrived would resolve reads onto nothing), must keep the
    * stamp sequence monotone with commit ids, and is immutable once
    * written (equal re-stamp = idempotent no-op).
    */
  def stampCommit(path: String, commitId: Long, tsMillis: Long): Unit = {
    require(LogFs.isDirectory(LogFs.child(path, s"$CommitCol=$commitId")),
      s"cannot stamp commit $commitId of $path — no $CommitCol=$commitId " +
        "directory exists; stamp AFTER the commit lands")
    commitTimestamps(path).find(_._1 == commitId) match {
      case Some((_, t)) =>
        require(t == tsMillis,
          s"commit $commitId of $path is already stamped $t and stamps " +
            s"are immutable — got $tsMillis; a changed commit time would " +
            "silently re-aim every AS OF TIMESTAMP read")
      case None =>
        commitTimestamps(path).foreach { case (cid, t) =>
          require(cid > commitId || t <= tsMillis,
            s"non-monotone stamp: commit $commitId at $tsMillis would " +
              s"precede earlier commit $cid stamped $t — AS OF TIMESTAMP " +
              "needs stamps non-decreasing in commit order")
          require(cid < commitId || t >= tsMillis,
            s"non-monotone stamp: commit $commitId at $tsMillis would " +
              s"follow later commit $cid stamped $t — AS OF TIMESTAMP " +
              "needs stamps non-decreasing in commit order")
        }
        LogFs.writeAtomic(LogFs.child(path, s"$TsPrefix$commitId"),
          tsMillis.toString)
    }
  }

  /** [[commit]] + [[stampCommit]] in the order the stamp contract
    * requires (data first, then the clock entry that makes it
    * addressable).
    */
  def commitStamped(delta: DataFrame, path: String, commitId: Long,
                    tsMillis: Long): Unit = {
    commit(delta, path, commitId)
    stampCommit(path, commitId, tsMillis)
  }

  /** Resolve "as of `tsMillis`" to a commit id: the latest stamped
    * commit at or before the instant. Loud on the three silent-wrong
    * paths: a log with no stamps, a LIVE commit directory that was
    * never stamped (resolution would silently skip it), and an
    * instant before the first commit (nothing existed — an empty
    * read would masquerade as an empty table).
    */
  /** The stream-start coordinate for "serve commits stamped AT or
    * AFTER `tsMillis`" (Delta's `startingTimestamp` semantics): the
    * latest commit id stamped strictly BEFORE the instant — the feed
    * window (that id, …] then begins with the first commit at/after
    * it — or (min commit − 1) when every commit is at/after. Same
    * all-stamped guard as [[versionAtTimestamp]]: an unstamped commit
    * cannot be placed on the clock.
    */
  def versionBeforeTimestamp(path: String, tsMillis: Long): Long = {
    val stamps = commitTimestamps(path)
    require(stamps.nonEmpty,
      s"$path has no stamped commits — stampCommit each commit to " +
        "enable timestamp-addressed streams")
    val stamped = stamps.map(_._1).toSet
    val unstamped = commitIds(path).filterNot(stamped).sorted
    require(unstamped.isEmpty,
      s"commits [${unstamped.mkString(", ")}] of $path are unstamped — " +
        "a timestamp start cannot place them on the clock; stamp them " +
        "or use startingVersion")
    val before = stamps.filter(_._2 < tsMillis).map(_._1)
    if (before.nonEmpty) before.max else stamps.map(_._1).min - 1
  }

  def versionAtTimestamp(path: String, tsMillis: Long): Long = {
    val stamps = commitTimestamps(path)
    require(stamps.nonEmpty,
      s"$path has no stamped commits — stampCommit each commit to " +
        "enable AS OF TIMESTAMP reads")
    val stamped = stamps.map(_._1).toSet
    val unstamped = commitIds(path).filterNot(stamped).sorted
    require(unstamped.isEmpty,
      s"commits [${unstamped.mkString(", ")}] of $path are unstamped — " +
        "AS OF TIMESTAMP cannot place them on the clock; stamp them or " +
        "use versioned reads")
    require(tsMillis >= stamps.head._2,
      s"timestamp $tsMillis predates the log's first commit " +
        s"(${stamps.head._1} stamped ${stamps.head._2}) — nothing " +
        "existed yet; an empty read here would masquerade as an " +
        "empty table")
    stamps.filter(_._2 <= tsMillis).map(_._1).max
  }

  /** The plain table AS OF TIMESTAMP — resolve, then [[snapshotAt]]
    * (whose horizon guard keeps retention loud on the clock path too).
    */
  def snapshotAsOf(spark: SparkSession, path: String, keys: Seq[String],
                   tsMillis: Long): DataFrame =
    snapshotAt(spark, path, keys, versionAtTimestamp(path, tsMillis))

  /** The ops table AS OF TIMESTAMP ([[snapshotAtOps]] after the same
    * resolution).
    */
  def snapshotAsOfOps(spark: SparkSession, path: String, keys: Seq[String],
                      tsMillis: Long): DataFrame =
    snapshotAtOps(spark, path, keys, versionAtTimestamp(path, tsMillis))

  /** [[changesBetweenOps]] addressed by the clock — "every change
    * between last night's run and tonight's": both endpoints resolve
    * through [[versionAtTimestamp]] (latest commit stamped ≤ t), then
    * the versioned feed runs unchanged, so the window is
    * `(version(t0), version(t1)]` — exactly the commits a consumer
    * who last read at instant t0 has not seen. Inherits every guard:
    * unresolvable instants, a start below the horizon, and t0/t1
    * resolving to the same commit (an empty window is `v0 < v1`
    * violated — loud, because a consumer polling faster than commits
    * land should skip the cycle, not process a silently-empty feed).
    */
  def changesBetweenOpsTimestamps(spark: SparkSession, path: String,
                                  keys: Seq[String], t0Millis: Long,
                                  t1Millis: Long,
                                  trackCols: Seq[String]): DataFrame =
    changesBetweenOps(spark, path, keys,
      versionAtTimestamp(path, t0Millis),
      versionAtTimestamp(path, t1Millis), trackCols)

  /** All landed commit ids of the log (directory listing). */
  private def commitIds(path: String): Seq[Long] =
    LogFs.list(path)
      .map(_.getPath.getName).filter(_.startsWith(s"$CommitCol="))
      .map(_.stripPrefix(s"$CommitCol=").toLong)

  /** The head commit id of the log, if any commits have landed — the
    * version a "latest" read pins itself to ([[GraftLog]] resolves its
    * default `versionAsOf` here ONCE at load, so a query planned
    * against the head stays on that head even if commits land before
    * the action runs).
    */
  def headVersion(path: String): Option[Long] = {
    val ids = commitIds(path)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Whether the log is OPS-shaped (rows carry [[OpCol]]) — ONE
    * footer read, the same probe [[requireMatchingShape]] uses on the
    * write path; loud on an empty log (shape is undefined there).
    */
  private[graft] def isOpsLog(spark: SparkSession, path: String): Boolean = {
    def firstParquet(dir: String): Option[String] = {
      val children = LogFs.list(dir).sortBy(_.getPath.getName)
      children.find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
        .orElse(children.filter(_.isDirectory)
          .flatMap(d => firstParquet(d.getPath.toString).toSeq).headOption)
    }
    val probe = LogFs.list(path)
      .filter(_.getPath.getName.startsWith(s"$CommitCol="))
      .sortBy(_.getPath.getName)
      .flatMap(d => firstParquet(d.getPath.toString).toSeq).headOption
    require(probe.nonEmpty,
      s"$path has no landed commit data — the log's shape is undefined")
    spark.read.parquet(probe.get).columns.contains(OpCol)
  }

  // ---- Write-path shape guard ---------------------------------------

  /** Commits must not silently flip a log between plain and ops shape:
    * a plain delta appended into an ops log gets `_op` null and the
    * liveness filter classifies every such row DEAD (a mis-routed
    * upsert vanishes from every snapshot); an ops delta into a plain
    * log would surface tombstones as data rows. Mirror of
    * requirePlainLog/requireOpsLog on the write path — one driver-side
    * footer read, only when the log already exists.
    */
  private[graft] def requireMatchingShape(delta: DataFrame, path: String): Unit = {
    // ONE file's footer decides the shape (every commit carries _op or
    // none does, by induction on this very guard) — never a listing of
    // the whole log, whose cost would grow with history
    def firstParquet(dir: String): Option[String] = {
      val children = LogFs.list(dir).sortBy(_.getPath.getName)
      children.find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
        .orElse(children.filter(_.isDirectory)
          .flatMap(d => firstParquet(d.getPath.toString).toSeq).headOption)
    }
    val probe = LogFs.list(path)
      .filter(_.getPath.getName.startsWith(s"$CommitCol="))
      .sortBy(_.getPath.getName)
      .flatMap(d => firstParquet(d.getPath.toString).toSeq).headOption
    probe.foreach { f =>
      val logHasOp = delta.sparkSession.read
        .parquet(f).columns.contains(OpCol)
      val deltaHasOp = delta.columns.contains(OpCol)
      require(!logHasOp || deltaHasOp,
        s"$path is an OPS log but the delta carries no $OpCol — such rows " +
          "would compact as DEAD (liveness filter is _op = 'u'); use " +
          "commitUpsert/commitDelete, or carry _op explicitly")
      require(logHasOp || !deltaHasOp,
        s"$path is a PLAIN log but the delta carries $OpCol — tombstones " +
          "would read as ordinary rows; start an ops log at a fresh path")
    }
  }

  // ---- Optimistic concurrency: commit claims ------------------------
  //
  // Commit ids are caller-assigned (they ARE the version order), and
  // without arbitration two INDEPENDENT writers that both compute
  // "head + 1" would land DIFFERENT deltas under one id — `commit`
  // appends interleave silently, `commitIdempotent`'s dynamic
  // overwrites can interleave to a mixed directory. The claim marker
  // closes this the way Delta/Iceberg do, reduced to its primitive:
  // landing commit id v first ATOMICALLY creates `_graft_claim_<v>`
  // naming the WRITER (LogFs.claimExclusive — rename-without-
  // overwrite, exactly one concurrent claimant wins). The same writer
  // re-claiming its own id is a no-op — that is the at-least-once
  // REDELIVERY contract (a retried foreachBatch, a re-appended
  // mixed-op delivery under one batch id) and it must keep working —
  // while a DIFFERENT writer gets a loud conflict naming the holder.
  // Single-writer callers never see any of this: they share the
  // default writer identity, so every existing call is unchanged.
  // MULTI-writer deployments must give each writer a distinct id
  // (Delta's txnAppId contract) and route contended appends through
  // [[commitWithRetry]].

  private val ClaimPrefix = "_graft_claim_"

  /** The default writer identity: all claims by unnamed callers are
    * one logical writer (the single-writer deployment), preserving
    * every pre-OCC behavior including same-id redelivery.
    */
  val SoloWriter = "solo"

  /** All claimed commit ids of the log (marker listing). */
  private def claimIds(path: String): Seq[Long] =
    LogFs.list(path)
      .filter(s => s.isFile && s.getPath.getName.startsWith(ClaimPrefix))
      .map(_.getPath.getName.stripPrefix(ClaimPrefix).toLong)

  /** The writer holding commit `commitId`'s claim, if any. */
  def claimHolder(path: String, commitId: Long): Option[String] = {
    val p = LogFs.child(path, s"$ClaimPrefix$commitId")
    if (LogFs.exists(p)) Some(LogFs.readString(p).trim) else None
  }

  /** Claim commit `commitId` for `writer`, or fail LOUDLY naming the
    * holder. First-writer-wins is atomic (rename-without-overwrite);
    * a writer re-claiming its own id succeeds (redelivery).
    */
  private[graft] def claimCommit(path: String, commitId: Long,
                          writer: String): Unit = {
    val p = LogFs.child(path, s"$ClaimPrefix$commitId")
    if (!LogFs.claimExclusive(p, writer)) {
      val holder = LogFs.readString(p).trim
      require(holder == writer,
        s"commit $commitId of $path is already claimed by writer " +
          s"'$holder' — writer '$writer' lost the race for this id; " +
          "re-read the head and retry at the next id (commitWithRetry " +
          "automates exactly that)")
    }
  }

  /** Claim the NEXT free commit id for `writer` — the blind-append leg
    * of the OCC loop: [[commitWithRetry]] minus conflict detection,
    * because a pure APPEND to an LWW log serializes cleanly in any
    * order (Delta's "blind append never conflicts" rule — the reader's
    * per-key compaction orders by commit id, and the appender by
    * definition derived nothing from a read version). Scans
    * commits ∪ claims for the head, claims head+1 atomically, retries
    * past lost claims. The caller MUST land data into the returned id;
    * a crash between claim and landing leaves an orphaned claim — the
    * same operator-visible state as any writer crashing mid-commit
    * (cleared manually, exactly the [[commitWithRetry]] contract).
    */
  private[graft] def claimNextId(path: String, writer: String,
                                 maxAttempts: Int = 50): Long = {
    var floor = (commitIds(path) ++ claimIds(path)).foldLeft(-1L)(math.max)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val target = floor + 1
      if (LogFs.claimExclusive(
          LogFs.child(path, s"$ClaimPrefix$target"), writer)) return target
      floor = target
    }
    throw new IllegalStateException(
      s"writer '$writer' lost the commit claim $maxAttempts times in a " +
        s"row on $path — contention is pathological; back off and retry")
  }

  // ---- Maintenance mutex: ONE maintenance actor per log -------------
  //
  // checkpoint/checkpointOps/checkpointOpsClustered/optimizeOps rewrite
  // shared state (the staging dir, the folded base, the horizon, the
  // vacuum) that the claim-per-commit protocol does not arbitrate —
  // before round 15 "one maintenance actor" was an ASSUMPTION. It is
  // now an enforced contract: every maintenance verb atomically
  // acquires `_graft_mx_maintenance` (rename-without-overwrite, the
  // claim primitive) and releases it on completion; a second concurrent
  // actor fails LOUDLY naming the holder instead of interleaving folds.
  // Ordinary writers (commit*/commitWithRetry) and readers never touch
  // it — writer-vs-maintenance safety is the horizon ordering, raced in
  // TopKChangelogSpec. A crash mid-maintenance leaves the marker
  // orphaned — the same operator-visible state as a crashed writer's
  // claim (clear it, re-run; every maintenance verb is re-runnable).

  private val MaintenanceMutex = "_graft_mx_maintenance"

  private def withMaintenanceMutex[T](path: String, actor: String)
      (body: => T): T = {
    val p = LogFs.child(path, MaintenanceMutex)
    require(LogFs.claimExclusive(p, actor), {
      val holder = scala.util.Try(LogFs.readString(p).trim)
        .getOrElse("<unknown>")
      s"maintenance mutex of $path is held by '$holder' — checkpoint/" +
        "OPTIMIZE are one-actor-at-a-time verbs; wait for it to finish, " +
        s"or clear the orphaned $MaintenanceMutex marker if its actor " +
        "crashed (every maintenance verb is safely re-runnable)"
    })
    try body finally LogFs.delete(p)
  }

  /** Streaming-sink epoch→commit map markers (multi-writer mode):
    * `_graft_sinkmap_<queryId>_<epoch>`, content = the commit id the
    * epoch landed at. One tiny file per commit — the claim markers'
    * asymptotics — swept below checkpoint horizons like claims.
    */
  private[graft] val SinkMapPrefix = "_graft_sinkmap_"

  // ---- Operation metadata: commitInfo --------------------------------
  //
  // Commits record stats/stamps/claims but — before round 15 — not the
  // VERB or the writer: an operator could not ask "was commit 7 a
  // restore or a merge, and who wrote it?" (Delta's commitInfo). One
  // more marker closes it: `_graft_info_<id>`, content = verb, writer,
  // and the commit's ROW COUNT — the count read from the landed
  // directory's parquet FOOTERS (metadata-only, no data scan, and
  // derived from the final on-disk content so a torn write can never
  // record a count its files don't hold). Written AFTER the data lands
  // by every verb; re-landing a deterministic delta recomputes the
  // identical marker (the redelivery contract). Markers are
  // OBSERVABILITY, never the read path: a commit without one reads
  // fine and surfaces null verb/writer in DESCRIBE HISTORY.

  private val InfoPrefix = "_graft_info_"

  /** The landed commit directory's exact row count, from parquet
    * footer metadata only (one open per file, no column IO).
    */
  def commitDirRowCount(path: String, commitId: Long): Long =
    dirRowCount(LogFs.child(path, s"$CommitCol=$commitId"))

  /** Footer-metadata row count of any parquet directory (no column
    * IO) — shared with the row-level spool's observability.
    */
  private[graft] def dirRowCount(dir: String): Long =
    LogFs.list(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            s.getPath, LogFs.hadoopConf))
        try rd.getRecordCount finally rd.close()
      }.sum

  /** The landed commit directory's total UNCOMPRESSED byte size, from
    * parquet footer metadata only (the row groups' total_byte_size —
    * the number that bounds a consumer's in-memory batch, which is why
    * the CDC byte-budget admission reads this and not the file sizes).
    */
  def commitDirByteSize(path: String, commitId: Long): Long = {
    val dir = LogFs.child(path, s"$CommitCol=$commitId")
    LogFs.list(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            s.getPath, LogFs.hadoopConf))
        try {
          import scala.jdk.CollectionConverters._
          rd.getFooter.getBlocks.asScala.map(_.getTotalByteSize).sum
        } finally rd.close()
      }.sum
  }

  /** Record commit `commitId`'s operation metadata (verb, writer, and
    * the footer-derived row count). Public so custom landing paths
    * (the streaming sink) record their epochs too.
    */
  def writeCommitInfo(path: String, commitId: Long, verb: String,
                      writer: String): Unit = {
    // the marker is tab-delimited and line-oriented; a writer id is a
    // FREE-FORM caller option (LogSink / INSERT), so a tab or newline
    // in it would corrupt the marker and break commitInfos/DESCRIBE
    // HISTORY for the whole log — refuse at write time, loudly
    Seq("verb" -> verb, "writer" -> writer).foreach { case (what, v) =>
      require(!v.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"commitInfo $what '$v' contains a tab/newline — the info " +
          "marker is tab-delimited; use a flat identifier")
    }
    LogFs.writeAtomic(LogFs.child(path, s"$InfoPrefix$commitId"),
      s"v1\n$verb\t$writer\t${commitDirRowCount(path, commitId)}")
  }

  /** All recorded operation metadata: commitId → (verb, writer, rows). */
  def commitInfos(path: String): Map[Long, (String, String, Long)] =
    LogFs.list(path)
      .filter(s => s.isFile && s.getPath.getName.startsWith(InfoPrefix))
      .map { s =>
        val lines = LogFs.readString(s.getPath.toString).split("\n")
        require(lines.headOption.contains("v1"),
          s"unrecognized info marker format in ${s.getPath}")
        // bounded split: exactly (verb, writer, rows) — a malformed
        // marker (too few fields) still fails loudly on p(2)
        val p = lines(1).split("\t", 3)
        (s.getPath.getName.stripPrefix(InfoPrefix).toLong,
          (p(0), p(1), p(2).toLong))
      }.toMap

  /** [[describeHistory]]'s schema — shared with the SQL-addressable
    * history child table ([[GraftLogCatalog]]'s `cat.t.history`).
    */
  val HistorySchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("commit", LongType, nullable = false),
      StructField("verb", StringType), StructField("writer", StringType),
      StructField("info_rows", LongType),
      StructField("ts_millis", LongType)))
  }

  /** DESCRIBE HISTORY — one row per landed commit: id, the recorded
    * verb/writer/row-count (null where a commit predates the info
    * markers), and the commit's stamp when the log is clock-addressed.
    * Driver-side metadata assembly, O(commits) — the same asymptotics
    * as the marker listings every read already does.
    */
  def describeHistory(spark: SparkSession, path: String): DataFrame = {
    val stamps = commitTimestamps(path).toMap
    val infos = commitInfos(path)
    val rows = commitIds(path).sorted.map { id =>
      org.apache.spark.sql.Row(id,
        infos.get(id).map(_._1).orNull,
        infos.get(id).map(_._2).orNull,
        infos.get(id).map(i => java.lang.Long.valueOf(i._3)).orNull,
        stamps.get(id).map(java.lang.Long.valueOf).orNull)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      HistorySchema)
  }

  /** [[describeDetail]]'s schema — shared with the SQL-addressable
    * detail child table ([[GraftLogCatalog]]'s `cat.t.detail`).
    */
  val DetailSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("keys", StringType),
      StructField("shape", StringType),
      StructField("head_version", LongType),
      StructField("horizon", LongType),
      StructField("num_commits", LongType),
      StructField("num_bases", LongType),
      StructField("num_data_files", LongType),
      StructField("size_bytes", LongType),
      StructField("evolved", BooleanType, nullable = false),
      StructField("renamed_columns", StringType),
      StructField("dropped_columns", StringType),
      StructField("check_constraints", StringType)))
  }

  /** DESCRIBE DETAIL — one row of table-level facts (Delta's
    * ergonomics): physical coordinates, shape, head/horizon, commit
    * and base counts, data-file count + on-disk bytes, and the
    * evolution state (union-read forced? renamed/dropped columns?).
    * Driver-side metadata assembly: marker listings plus one
    * recursive file listing of the commit directories — O(files),
    * the same order as any maintenance verb's sweep, never a data
    * job. Null horizon = nothing folded yet.
    */
  def describeDetail(spark: SparkSession, path: String,
                     keys: Seq[String]): DataFrame = {
    val ids = commitIds(path)
    require(ids.nonEmpty, s"$path has no commits — nothing to describe")
    def walk(dir: String): Seq[org.apache.hadoop.fs.FileStatus] =
      LogFs.list(dir).flatMap(s =>
        if (s.isDirectory) walk(s.getPath.toString) else Seq(s))
    val files = ids.flatMap(id =>
      walk(LogFs.child(path, s"$CommitCol=$id")))
      .filter(_.getPath.getName.endsWith(".parquet"))
    val h = horizonOf(path)
    val m = currentMapping(path)
      .getOrElse(ColumnMapping(Map.empty, Set.empty))
    val row = org.apache.spark.sql.Row(
      path, keys.mkString(","),
      if (isOpsLog(spark, path)) "ops" else "plain",
      java.lang.Long.valueOf(ids.max),
      if (h == Long.MinValue) null else java.lang.Long.valueOf(h),
      java.lang.Long.valueOf(ids.size.toLong),
      java.lang.Long.valueOf(baseIds(path).size.toLong),
      java.lang.Long.valueOf(files.size.toLong),
      java.lang.Long.valueOf(files.map(_.getLen).sum),
      java.lang.Boolean.valueOf(isEvolvedLog(path)),
      m.renames.toSeq.sortBy(_._1)
        .map { case (p, l) => s"$l<-$p" }.mkString(","),
      m.dropped.toSeq.sorted.mkString(","),
      checkConstraints(path).toSeq.sortBy(_._1)
        .map { case (n, sql) => s"$n: CHECK ($sql)" }.mkString("; "))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.List.of(row)), DetailSchema)
  }

  /** The append write itself, claim-free — the checkpoint fold lands
    * through this (it REWRITES an id that is legitimately claimed by
    * whoever committed it; its own guard is the horizon ordering).
    */
  private def appendCommit(delta: DataFrame, path: String,
                           commitId: Long): Unit =
    delta.withColumn(CommitCol, lit(commitId))
      .write.partitionBy(CommitCol).mode("append").parquet(path)

  private def overwriteCommit(delta: DataFrame, path: String, commitId: Long,
                              alsoPartitionBy: Seq[String]): Unit =
    delta.withColumn(CommitCol, lit(commitId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(CommitCol +: alsoPartitionBy: _*).parquet(path)

  /** Append `delta` as commit `commitId`. Commit ids must be issued
    * monotonically by the caller (they are the version order); row-level
    * semantics are last-write-wins per key at read time, so a commit may
    * freely mix brand-new and replacing rows. The id is CLAIMED for
    * `writer` first — a different writer holding it fails loudly (see
    * the claim contract above; unnamed callers all share [[SoloWriter]]
    * and are unaffected).
    */
  def commit(delta: DataFrame, path: String, commitId: Long,
             writer: String = SoloWriter): Unit =
    commitVerbed(delta, path, commitId, writer, "append")

  /** Create a FRESH log at `path` with `tableSchema` and no rows: one
    * empty genesis commit (id 0, verb `create`) whose parquet footer
    * carries the declared schema — the first commit IS the schema
    * declaration, by the same induction [[requireMatchingShape]] runs
    * on. `ops = true` (the default, the table format's real shape)
    * appends the `_op` column; plain logs take the schema as-is. The
    * empty frame cannot ride [[commit]]'s dynamic partition overwrite
    * (zero rows land zero partitions — the [[checkpointOps]] empty-fold
    * special case, shared here), so the genesis writes its directory
    * directly. Loud when `path` already holds commits — CREATE makes a
    * table; an existing log is ADOPTED by registration, never
    * re-created over.
    */
  def createLog(spark: SparkSession, path: String,
                tableSchema: org.apache.spark.sql.types.StructType,
                ops: Boolean = true, writer: String = SoloWriter): Unit = {
    require(!tableSchema.fieldNames.exists(n =>
      n.toLowerCase == CommitCol || n.toLowerCase == OpCol),
      s"the table schema carries a reserved column ($CommitCol/$OpCol)")
    require(commitIds(path).isEmpty,
      s"$path already holds commits — CREATE makes a fresh log; adopt " +
        "an existing one by registering it")
    val shape =
      if (ops) tableSchema.add(OpCol, org.apache.spark.sql.types.StringType)
      else tableSchema
    claimCommit(path, 0L, writer)
    val dir = LogFs.child(path, s"$CommitCol=0")
    LogFs.delete(dir)
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), shape)
      .write.mode("overwrite").parquet(dir)
    writeCommitInfo(path, 0L, "create", writer)
  }

  /** SCHEMA EVOLUTION as a COMMIT (the q143/q185 law, packaged as a
    * verb): land ONE empty schema-bearing commit whose parquet footer
    * carries the union of the log's current column set and
    * `newFields` appended at the end. History is untouched — every
    * pinned footer below stays byte-identical, versioned reads below
    * the evolution see the old shape, and a mergeSchema read folds
    * the union with pre-evolution rows null-filling the new columns.
    * Columns can only be ADDED, nullable, top-level — a drop, rename,
    * or retype is a NEW TABLE (the rule every lakehouse format
    * without column-mapping metadata enforces), refused loudly.
    * Planning cost is one mergeSchema footer listing plus one empty
    * parquet write — no data is read or rewritten at any scale.
    * Returns the landed commit id.
    */
  def commitAddColumns(spark: SparkSession, path: String,
                       newFields: Seq[org.apache.spark.sql.types.StructField],
                       writer: String = SoloWriter): Long = {
    require(newFields.nonEmpty, "ADD COLUMNS needs at least one column")
    val current = spark.read.option("mergeSchema", "true").parquet(path)
      .schema.fields.filter(_.name != CommitCol)
    val existing = current.map(_.name.toLowerCase).toSet
    newFields.foreach { f =>
      // case-INSENSITIVE like the duplicate check below: under Spark's
      // default resolution `_COMMIT` collides with the `_commit`
      // partition column — a case-variant reserved name must refuse
      // just as loudly as the exact spelling
      require(f.name.toLowerCase != CommitCol &&
        f.name.toLowerCase != OpCol,
        s"column ${f.name} is a reserved changelog column")
      require(!existing.contains(f.name.toLowerCase),
        s"column ${f.name} already exists in the log at $path — " +
          "evolution only ADDS columns")
      require(f.nullable,
        s"added column ${f.name} must be NULLABLE — every " +
          "pre-evolution row null-fills it under the union read")
      require(graft.streaming.LogSink.supportedType(f.dataType),
        s"added column ${f.name} has type ${f.dataType} — outside " +
          "the log's supported type surface")
    }
    // on a COLUMN-MAPPED log the new name must also clear the LOGICAL
    // namespace: a physical footer check alone would admit a column
    // whose name collides with a renamed column's current logical
    // name, and the mapped read would then project two columns to one
    currentMapping(path).foreach { m =>
      val logical = current.map(f => m.logicalOf(f.name).toLowerCase)
        .toSet
      val retired = m.dropped.map(_.toLowerCase)
      newFields.foreach { f =>
        require(!logical.contains(f.name.toLowerCase),
          s"column ${f.name} collides with a LOGICAL (renamed) column " +
            s"of the mapped log at $path")
        // a DROPPED column's physical name is retired FOREVER — the
        // footer-union check holds it while pre-drop footers survive,
        // and this holds it after a checkpoint physically reclaimed
        // them (re-admitting the name would resurrect the dropped
        // column for time travel between the drop and the re-add)
        require(!retired.contains(f.name.toLowerCase),
          s"column ${f.name} is a RETIRED (dropped) column of the " +
            s"mapped log at $path — a dropped physical name never " +
            "comes back; pick a fresh name")
      }
    }
    // keep _op LAST (the ops-shape induction reads it as the final
    // field of every commit footer): new columns slot in before it
    val (ops, data) = current.partition(_.name == OpCol)
    val evolved = org.apache.spark.sql.types.StructType(
      data ++ newFields ++ ops)
    // the evolution marker lands FIRST (see EvolvedMarker: a
    // false-positive is a harmless mergeSchema read; the inverse
    // order risks silent column loss on a fresh registration)
    LogFs.writeAtomic(LogFs.child(path, EvolvedMarker), "v1")
    val id = landEmptySchemaCommit(spark, path, evolved, "add_columns",
      writer)
    id
  }

  /** Land ONE empty commit whose parquet footer carries `shape` —
    * the shared substrate of every metadata-only schema verb
    * (add_columns / rename_column / drop_column): claims the next id,
    * writes a zero-row parquet directory, records the verb. No data
    * is read or rewritten at any scale.
    */
  private def landEmptySchemaCommit(spark: SparkSession, path: String,
      shape: org.apache.spark.sql.types.StructType, verb: String,
      writer: String,
      markerFor: Option[Long => (String, String)] = None): Long = {
    val id = claimNextId(path, writer)
    val dir = LogFs.child(path, s"$CommitCol=$id")
    LogFs.delete(dir)
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), shape)
      .write.mode("overwrite").parquet(dir)
    // the verb's state marker (mapping / constraint) lands BEFORE the
    // info marker: a crash between the two leaves the state ACTIVE
    // with a null verb in DESCRIBE HISTORY — a visible anomaly on an
    // already-recognized state (commits without info read fine) —
    // never the inverse (a recorded 'rename_column' whose mapping
    // silently never changed, which no reader could detect)
    markerFor.foreach { f =>
      val (name, content) = f(id)
      LogFs.writeAtomic(LogFs.child(path, name), content)
    }
    writeCommitInfo(path, id, verb, writer)
    id
  }

  /** The SINGLETON evolution marker: written (idempotently) by the
    * first `add_columns` verb, BEFORE its commit lands — a crash
    * between the two leaves a false-positive marker, which is
    * harmless (the union read of a never-evolved log is still
    * correct, it merely pays mergeSchema planning), while the
    * inverse order could leave an evolved log that a fresh session
    * reads through one arbitrary footer, silently dropping columns.
    * Monotone by design — evolution is never un-happened — so
    * maintenance must NEVER sweep it (after a fold past the
    * evolution the union read stays correct; the marker then only
    * costs mergeSchema planning, the price of a provably-safe load).
    */
  private[graft] val EvolvedMarker = "_graft_evolved"

  /** True when the log's commit footers may carry DIFFERENT column
    * sets — an `add_columns` commit landed (the singleton
    * [[EvolvedMarker]]) or a mapped DROP is in force (commits landed
    * after the drop omit the dropped physical column). The table
    * surface reads this at EVERY load and FORCES the union
    * (mergeSchema) read on an evolved log, so a fresh session that
    * re-registers the table without remembering to pass mergeSchema
    * can never have Spark infer the schema from an arbitrary
    * pre-evolution footer and silently drop the added columns (the
    * registration flag becomes a no-op the log itself subsumes).
    * Load-path cost: ONE marker stat plus the mapping listing every
    * mapped read already does — never a content read per commit (the
    * pre-marker implementation opened every `_graft_info_*` marker
    * at every load: a per-query GET storm at object-store commit
    * counts; spec-pinned at zero content reads now). A log evolved
    * by a PRE-MARKER build of this library carries no marker — one
    * re-run of any evolving verb (or writing the marker by hand)
    * migrates it; this library's own verbs have always landed
    * through [[commitAddColumns]].
    */
  def isEvolvedLog(path: String): Boolean =
    LogFs.exists(LogFs.child(path, EvolvedMarker)) ||
      currentMapping(path).exists(_.dropped.nonEmpty)

  // ---- Column mapping: RENAME/DROP COLUMN as metadata ----------------
  //
  // Delta's columnMapping discipline, reduced to this format's marker
  // primitive: the parquet footers keep each column's PHYSICAL name
  // (its name at birth — create/add_columns time), and a tiny mapping
  // marker records the logical↔physical correspondence, so a rename
  // or drop is ONE empty commit + ONE marker — never a data rewrite,
  // at any scale. `_graft_mapping_<id>` carries the FULL mapping
  // state in force from commit `<id>` on (line-oriented:
  // `r<TAB>physical<TAB>logical` per renamed column, `d<TAB>physical`
  // per dropped column); a read at version v resolves through the
  // NEWEST marker ≤ v — no fold, and time travel below the rename
  // sees the old names for free. Mapping markers are never swept by
  // maintenance (they are the log's live name state, O(renames)
  // bytes); clones copy them like every other marker.
  //
  // Boundaries, all loud:
  //  - KEY columns never rename/drop — the key set is the table's row
  //    identity and lives in the REGISTRATION (session conf), not the
  //    log; renaming it would desynchronize every registered reader.
  //  - retype stays refused (a type change is a new table).
  //  - the change FEED maps when the mapping is STABLE across its
  //    window (tracked columns translate logical→physical for the
  //    diff, outputs rename back); a mapping commit strictly inside
  //    the window refuses loudly (one physical column, two names —
  //    ambiguous), whether or not the end-of-window mapping is empty
  //    (a rename-and-back still changed names mid-window). BOTH
  //    streams map — the TABLE's own stream and the FEED stream
  //    (physical diff, logical old_/new_ output, fingerprint-pinned
  //    per run — drift fails the batch, restart re-pins; historical
  //    mapping commits become batch boundaries in the source);
  //    streaming WRITES map like batch writes.
  //  - a dropped column's bytes remain in pre-drop footers until a
  //    checkpoint rewrite — Delta's semantics exactly; logical drop
  //    now, physical reclaim with maintenance.

  private[graft] val MappingPrefix = "_graft_mapping_"

  /** The logical↔physical name state of a mapped log. `renames` maps
    * PHYSICAL → LOGICAL (identity entries never stored); `dropped`
    * holds physical names whose column is logically deleted.
    */
  final case class ColumnMapping(renames: Map[String, String],
                                 dropped: Set[String]) {
    def logicalOf(physical: String): String =
      renames.getOrElse(physical, physical)
    lazy val physicalByLogical: Map[String, String] =
      renames.map(_.swap)
    def physicalOf(logical: String): String =
      physicalByLogical.getOrElse(logical, logical)
    def isEmpty: Boolean = renames.isEmpty && dropped.isEmpty
  }

  private def serializeMapping(m: ColumnMapping): String = {
    val rs = m.renames.toSeq.sortBy(_._1)
      .map { case (p, l) => s"r\t$p\t$l" }
    val ds = m.dropped.toSeq.sorted.map(p => s"d\t$p")
    ("v1" +: (rs ++ ds)).mkString("\n")
  }

  private def parseMapping(content: String): ColumnMapping = {
    val lines = content.split("\n")
    require(lines.headOption.contains("v1"),
      "unrecognized mapping marker format")
    val entries = lines.drop(1).filter(_.nonEmpty).map(_.split("\t", 3))
    ColumnMapping(
      entries.collect { case Array("r", p, l) => p -> l }.toMap,
      entries.collect { case Array("d", p) => p }.toSet)
  }

  /** The mapping in force at version `v` — the newest marker ≤ v;
    * None when the log has never been renamed/dropped below v.
    */
  def mappingAt(path: String, v: Long): Option[ColumnMapping] = {
    val markers = LogFs.list(path)
      .filter(s => s.isFile && s.getPath.getName.startsWith(MappingPrefix))
      .map(s => (s.getPath.getName.stripPrefix(MappingPrefix).toLong,
        s.getPath.toString))
      .filter(_._1 <= v)
    if (markers.isEmpty) None
    else Some(parseMapping(LogFs.readString(markers.maxBy(_._1)._2)))
  }

  /** The mapping in force at the head (write-side coordinate). */
  def currentMapping(path: String): Option[ColumnMapping] =
    mappingAt(path, Long.MaxValue)

  /** Canonical fingerprint of the CURRENT mapping state — what a
    * mapped stream pins at start and re-checks per batch (drift =
    * restart). Empty string = no mapping.
    */
  def mappingFingerprint(path: String): String =
    currentMapping(path).map(serializeMapping).getOrElse("")

  /** All mapping-marker commit ids — the feed's window-stability
    * probe (a marker strictly inside a feed window means the names
    * changed mid-window).
    */
  private[graft] def mappingIds(path: String): Seq[Long] =
    LogFs.list(path)
      .filter(s => s.isFile &&
        s.getPath.getName.startsWith(MappingPrefix))
      .map(_.getPath.getName.stripPrefix(MappingPrefix).toLong)

  /** Project a PHYSICAL-name frame to its LOGICAL shape under `m`:
    * dropped columns vanish, renamed columns surface their logical
    * name, everything else (including `_op`/`_commit` if present —
    * reserved names can never be mapped) passes through. Pure
    * projection — zero shuffle, participates in column pruning.
    */
  def applyMapping(df: DataFrame, m: ColumnMapping): DataFrame =
    df.select(df.columns.filterNot(m.dropped.contains)
      .map(c => col(c).as(m.logicalOf(c))).toIndexedSeq: _*)

  /** [[applyMapping]] for an optional mapping — the read-path form. */
  def applyMapping(df: DataFrame,
                   m: Option[ColumnMapping]): DataFrame =
    m.fold(df)(applyMapping(df, _))

  /** Rename every field of a LOGICAL-shape schema to its physical
    * name — the write-path inverse of [[applyMapping]] (positional:
    * the rows are untouched, only the staged parquet field names
    * change).
    */
  def toPhysicalSchema(schema: org.apache.spark.sql.types.StructType,
                       m: Option[ColumnMapping])
      : org.apache.spark.sql.types.StructType =
    m.fold(schema)(mm => org.apache.spark.sql.types.StructType(
      schema.fields.map(f => f.copy(name = mm.physicalOf(f.name)))))

  /** The log's current LOGICAL data columns (mapped names, dropped
    * columns excluded, reserved columns excluded) — the schema a SQL
    * user of the table sees, minus nothing. One footer-union listing.
    */
  def logicalColumns(spark: SparkSession, path: String): Seq[String] = {
    val m = currentMapping(path)
      .getOrElse(ColumnMapping(Map.empty, Set.empty))
    spark.read.option("mergeSchema", "true").parquet(path)
      .schema.fields.map(_.name)
      .filter(n => n != CommitCol && n != OpCol)
      .filterNot(m.dropped.contains).map(m.logicalOf).toSeq
  }

  /** Shared validation: resolve logical column `name` on the mapped
    * log (case-insensitive, the session default), refusing reserved
    * and KEY columns. Returns the column's PHYSICAL name.
    */
  private def resolveMappedColumn(spark: SparkSession, path: String,
      keys: Seq[String], name: String, verb: String): String = {
    require(!name.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"$verb column name '$name' contains a tab/newline — mapping " +
        "markers are tab-delimited; use a flat identifier")
    require(name.toLowerCase != CommitCol && name.toLowerCase != OpCol,
      s"$verb ${name}: reserved changelog column")
    require(!keys.exists(_.equalsIgnoreCase(name)),
      s"$verb $name: it is a KEY column — the key set is the table's " +
        "row identity and lives in the registration, not the log; " +
        "renaming or dropping it would desynchronize every registered " +
        "reader (re-key by writing a new table)")
    val m = currentMapping(path)
      .getOrElse(ColumnMapping(Map.empty, Set.empty))
    val physical = spark.read.option("mergeSchema", "true").parquet(path)
      .schema.fields.map(_.name)
      .filter(n => n != CommitCol && n != OpCol)
      .filterNot(m.dropped.contains)
    val hits = physical.filter(p =>
      m.logicalOf(p).equalsIgnoreCase(name))
    require(hits.nonEmpty,
      s"$verb $name: no such column on the log at $path — logical " +
        s"columns: [${physical.map(m.logicalOf).mkString(", ")}]")
    require(hits.length == 1,
      s"$verb $name: ambiguous under case-insensitive resolution " +
        s"(physical candidates: [${hits.mkString(", ")}])")
    hits.head
  }

  /** RENAME COLUMN as metadata: one empty commit (verb
    * `rename_column`, footers untouched — same physical union shape)
    * plus one mapping marker at that id. Reads at/above the commit
    * serve the new name; time travel below it serves the old; pinned
    * footers keep their physical names forever. Returns the landed
    * commit id.
    */
  def commitRenameColumn(spark: SparkSession, path: String,
      keys: Seq[String], oldName: String, newName: String,
      writer: String = SoloWriter): Long = {
    val physical = resolveMappedColumn(spark, path, keys, oldName,
      "RENAME COLUMN")
    require(!newName.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"RENAME COLUMN to '$newName' — mapping markers are " +
        "tab-delimited; use a flat identifier")
    require(newName.trim.nonEmpty, "RENAME COLUMN to an empty name")
    require(newName.toLowerCase != CommitCol &&
      newName.toLowerCase != OpCol,
      s"RENAME COLUMN to $newName: reserved changelog column")
    val m = currentMapping(path)
      .getOrElse(ColumnMapping(Map.empty, Set.empty))
    val union = spark.read.option("mergeSchema", "true").parquet(path)
      .schema.fields.filter(_.name != CommitCol)
    val otherLogical = union.map(_.name)
      .filter(n => n != OpCol && n != physical)
      .filterNot(m.dropped.contains).map(m.logicalOf)
    require(!otherLogical.exists(_.equalsIgnoreCase(newName)),
      s"RENAME COLUMN to $newName: collides with an existing logical " +
        s"column of the log at $path")
    val renamed =
      if (physical.equalsIgnoreCase(newName) && physical == newName)
        m.renames - physical // renamed back to its birth name
      else m.renames.updated(physical, newName)
    val next = m.copy(renames = renamed)
    landEmptySchemaCommit(spark, path,
      org.apache.spark.sql.types.StructType(union), "rename_column",
      writer, markerFor = Some(id =>
        (s"$MappingPrefix$id", serializeMapping(next))))
  }

  /** DROP COLUMN as metadata: one empty commit (verb `drop_column`)
    * plus one mapping marker whose state retires the column's
    * physical name. The bytes in pre-drop footers remain until a
    * checkpoint rewrite (Delta's semantics — logical drop now,
    * physical reclaim with maintenance); commits landed after the
    * drop simply omit the column, which is why a mapped-drop log
    * reads through the union path ([[isEvolvedLog]]). The retired
    * physical name can never be re-added (the footer-union collision
    * check in [[commitAddColumns]] holds it). Returns the landed
    * commit id.
    */
  def commitDropColumn(spark: SparkSession, path: String,
      keys: Seq[String], name: String,
      writer: String = SoloWriter): Long = {
    val physical = resolveMappedColumn(spark, path, keys, name,
      "DROP COLUMN")
    val m = currentMapping(path)
      .getOrElse(ColumnMapping(Map.empty, Set.empty))
    val union = spark.read.option("mergeSchema", "true").parquet(path)
      .schema.fields.filter(_.name != CommitCol)
    val next = ColumnMapping(m.renames - physical, m.dropped + physical)
    landEmptySchemaCommit(spark, path,
      org.apache.spark.sql.types.StructType(union), "drop_column",
      writer, markerFor = Some(id =>
        (s"$MappingPrefix$id", serializeMapping(next))))
  }

  // ---- Table CHECK constraints ---------------------------------------
  //
  // Delta's constraint discipline on this format's marker primitive:
  // `_graft_check_<name>` carries one constraint's predicate SQL
  // (spoken in the table's CURRENT LOGICAL column names), and adding/
  // dropping one is an empty properties commit (verbs
  // `add_constraint`/`drop_constraint` in DESCRIBE HISTORY) plus the
  // marker — never a data operation beyond the one-time validation of
  // existing rows at ADD time. Enforcement is everywhere a row can
  // land:
  //  - SQL writes (INSERT / UPDATE / MERGE / df.writeTo) ride Spark's
  //    OWN analyzer rule — LogTable.constraints() surfaces these as
  //    enforced Check constraints and ResolveTableConstraints injects
  //    the CheckInvariant filter into every V2WriteCommand/WriteDelta;
  //  - library verbs (commit/commitUpsert/commitIdempotent/
  //    commitWithRetry/restore) wrap the delta in
  //    [[withConstraintChecks]] — a guard PROJECTION inside the write
  //    job itself (raise_error on violation: no second scan, the
  //    write fails before landing a file);
  //  - streaming epochs validate their staged files at the driver's
  //    epoch commit, BEFORE any rename lands them.
  // Null semantics are SQL CHECK semantics: a predicate evaluating to
  // NULL passes. Tombstones (`_op = 'd'`, data columns all null) are
  // EXEMPT — a delete names a row, it does not write one. Maintenance
  // folds are pure rewrites of already-validated state and skip the
  // guard. RESTORE validates: rolling back to data that predates the
  // constraint refuses loudly (drop the constraint first) — stricter
  // than Delta's RESTORE, which silently resurrects violating rows.

  private[graft] val ConstraintPrefix = "_graft_check_"

  /** The log's CHECK constraints: name → predicate SQL (logical
    * column names). One marker listing + one tiny content read per
    * constraint — only ever paid on logs that declared one.
    */
  def checkConstraints(path: String): Map[String, String] =
    LogFs.list(path)
      .filter(s => s.isFile &&
        s.getPath.getName.startsWith(ConstraintPrefix))
      .map { s =>
        val parts = LogFs.readString(s.getPath.toString).split("\n", 2)
        require(parts.headOption.contains("v1") && parts.length == 2,
          s"unrecognized constraint marker format in ${s.getPath}")
        (s.getPath.getName.stripPrefix(ConstraintPrefix), parts(1))
      }.toMap

  /** ADD CONSTRAINT <name> CHECK (<predicateSql>): validates the
    * predicate against the current LOGICAL schema AND the existing
    * rows (head snapshot — Delta's ADD CONSTRAINT discipline: a
    * constraint the data already violates refuses, naming the count),
    * then lands one empty properties commit + the marker. Returns the
    * landed commit id.
    */
  def addCheckConstraint(spark: SparkSession, path: String,
      keys: Seq[String], name: String, predicateSql: String,
      writer: String = SoloWriter, validated: Boolean = false): Long = {
    require(name.matches("[A-Za-z0-9._-]+"),
      s"constraint name '$name' must use only [A-Za-z0-9._-] — it " +
        "names the on-disk marker")
    require(predicateSql.trim.nonEmpty, "empty CHECK predicate")
    require(!checkConstraints(path).contains(name),
      s"constraint $name already exists on $path — DROP it first")
    val head = headVersion(path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no commits — create the log before constraining it"))
    // resolve against the LOGICAL head frame: unknown/reserved names
    // and type errors refuse here, loudly, before anything lands
    val snap = applyMapping(
      if (isOpsLog(spark, path))
        snapshotAtOpsEvolved(spark, path, keys, head)
      else snapshotAtEvolved(spark, path, keys, head),
      currentMapping(path))
    val pred = org.apache.spark.sql.functions.expr(predicateSql)
    require(snap.select(pred.cast("boolean")).schema.head.dataType ==
      org.apache.spark.sql.types.BooleanType, // analysis forced here
      s"CHECK ($predicateSql) is not a boolean predicate")
    // `validated = true` (the SQL path: AddCheckConstraintExec already
    // ran the violation count against the resolved snapshot) skips
    // the data scan — the schema/type resolution above still ran
    if (!validated) {
      val violating = snap.filter(!coalesce(pred, lit(true))).count()
      require(violating == 0L,
        s"cannot ADD CONSTRAINT $name CHECK ($predicateSql) on $path " +
          s"— $violating existing row(s) violate it")
    }
    val union = spark.read.option("mergeSchema", "true").parquet(path)
      .schema.fields.filter(_.name != CommitCol)
    landEmptySchemaCommit(spark, path,
      org.apache.spark.sql.types.StructType(union), "add_constraint",
      writer, markerFor = Some(_ =>
        (s"$ConstraintPrefix$name", s"v1\n$predicateSql")))
  }

  /** DROP CONSTRAINT: removes the marker (enforcement stops), then
    * records the verb as an empty commit — effect before record, like
    * every state verb here (a crash between the two leaves a dropped
    * constraint with no history line, never a recorded drop that
    * still enforces). Returns the landed commit id.
    */
  def dropCheckConstraint(spark: SparkSession, path: String,
      name: String, writer: String = SoloWriter): Long = {
    require(checkConstraints(path).contains(name),
      s"no constraint named $name on $path — declared: " +
        s"[${checkConstraints(path).keys.toSeq.sorted.mkString(", ")}]")
    LogFs.delete(LogFs.child(path, s"$ConstraintPrefix$name"))
    val union = spark.read.option("mergeSchema", "true").parquet(path)
      .schema.fields.filter(_.name != CommitCol)
    landEmptySchemaCommit(spark, path,
      org.apache.spark.sql.types.StructType(union), "drop_constraint",
      writer)
  }

  /** Wrap a PHYSICAL-name delta in the log's constraint guards: each
    * row either passes every CHECK (null = pass, SQL semantics), is a
    * tombstone (exempt), or THROWS inside the write job itself —
    * raise_error in a guard projection, so enforcement adds no second
    * scan and no file lands. Constraint predicates speak LOGICAL
    * names; their column references translate to the delta's physical
    * spelling here. Zero-cost on unconstrained logs (one listing).
    */
  private[graft] def withConstraintChecks(delta: DataFrame,
                                          path: String): DataFrame = {
    val cs = checkConstraints(path)
    if (cs.isEmpty) return delta
    val m = currentMapping(path)
      .getOrElse(ColumnMapping(Map.empty, Set.empty))
    // guard in the LOGICAL namespace (the predicates' own): rename
    // every present column logical-ward, filter, rename back — two
    // pure projections bracketing the guard, zero shuffle, and
    // `expr(sql)` resolves the predicate exactly as the SQL surface
    // would (dropped columns, if a legacy delta still carries one,
    // pass through under their physical spelling — unreferencable by
    // any predicate, never lost)
    val logical = delta.select(delta.columns.map(c =>
      col(c).as(m.logicalOf(c))).toIndexedSeq: _*)
    val exempt =
      if (logical.columns.contains(OpCol)) col(OpCol) === "d"
      else lit(false)
    val rowJson = org.apache.spark.sql.functions.to_json(
      org.apache.spark.sql.functions.struct(
        logical.columns.filterNot(_ == OpCol).map(col).toIndexedSeq: _*))
    val guards = cs.toSeq.sortBy(_._1).map { case (name, sql) =>
      val pred = org.apache.spark.sql.functions.expr(sql)
      when(exempt || coalesce(pred, lit(true)), lit(true))
        .otherwise(org.apache.spark.sql.functions.raise_error(
          org.apache.spark.sql.functions.concat(
            lit(s"CHECK constraint $name ($sql) violated by row: "),
            coalesce(rowJson, lit("<row>")))).cast("boolean"))
    }
    logical.filter(guards.reduce(_ && _))
      .select(delta.columns.map(c =>
        col(m.logicalOf(c)).as(c)).toIndexedSeq: _*)
  }

  /** Driver-side validation of a streaming epoch's STAGED files
    * before any of them land — the stream-sink leg of constraint
    * enforcement (the epoch's rows exist only as staged parquet by
    * the time the driver commits it). One read of the epoch's own
    * files, only on constrained logs.
    */
  private[graft] def validateStagedConstraints(spark: SparkSession,
      path: String, stagedFiles: Seq[String]): Unit = {
    if (stagedFiles.isEmpty || checkConstraints(path).isEmpty) return
    val staged = spark.read.parquet(stagedFiles: _*)
    // the guard throws inside the count job on the first violation
    withConstraintChecks(staged, path).count(): Unit
  }

  /** [[commit]] with the verb the info marker records — the internal
    * entry every higher verb (upsert/delete/merge/restore) routes
    * through so DESCRIBE HISTORY names the operation, not the plumbing.
    */
  private def commitVerbed(delta: DataFrame, path: String, commitId: Long,
                           writer: String, verb: String): Unit = {
    require(commitId >= 0, s"commitId must be >= 0, got $commitId")
    require(!delta.columns.contains(CommitCol),
      s"Changelog reserves column name $CommitCol; rename it on the input")
    requireMatchingShape(delta, path)
    claimCommit(path, commitId, writer)
    appendCommit(withConstraintChecks(delta, path), path, commitId)
    writeCommitInfo(path, commitId, verb, writer)
  }

  /** Append-or-replace commit `commitId` IDEMPOTENTLY: a dynamic
    * partition overwrite of this commit's own `_commit=<v>` directory
    * (plus any `alsoPartitionBy` sub-dirs present in the delta). A
    * re-delivered write of the SAME deterministic delta — the
    * Structured Streaming foreachBatch retry contract — lands
    * byte-identically on top of any complete or partial earlier
    * attempt, while every other commit's directory is untouched. This
    * is what makes a changelog the exactly-once substrate: the writer
    * keys physical placement by the commit id it was told, so the
    * storage layer absorbs at-least-once delivery. The claim makes the
    * "same writer" premise of that contract EXPLICIT: redelivery is
    * the same writer re-landing its own id (allowed, byte-identical);
    * a DIFFERENT writer overwriting a held id is a conflict and fails
    * loudly before touching any file.
    */
  def commitIdempotent(delta: DataFrame, path: String, commitId: Long,
                       alsoPartitionBy: Seq[String] = Nil,
                       writer: String = SoloWriter): Unit = {
    require(commitId >= 0, s"commitId must be >= 0, got $commitId")
    require(!delta.columns.contains(CommitCol),
      s"Changelog reserves column name $CommitCol; rename it on the input")
    requireMatchingShape(delta, path)
    claimCommit(path, commitId, writer)
    overwriteCommit(withConstraintChecks(delta, path), path, commitId,
      alsoPartitionBy)
    writeCommitInfo(path, commitId, "append", writer)
  }

  /** OPTIMISTIC MULTI-WRITER COMMIT — the Delta/Iceberg commit loop on
    * the claim primitive. The caller computed `delta` against the log
    * state AS OF `readVersion` (pass the head it read; −1 for a fresh
    * log) and wants it landed at the next free id:
    *
    *  1. target = max(current head, readVersion) + 1; atomically claim
    *     it for `writer` — losing the claim means another writer is
    *     landing that id: advance past it and try again (bounded by
    *     `maxAttempts`);
    *  2. holding the claim, run CONFLICT DETECTION: any commit landed
    *     in (readVersion, target) whose keys intersect this delta's
    *     keys means the state this delta was derived from has changed
    *     underneath it — blind landing would silently lose that
    *     writer's update (write skew). The claim is RELEASED and the
    *     failure is loud: the caller must re-derive against the new
    *     head (an automatic retry cannot — only the caller knows how
    *     to recompute the delta). Key-DISJOINT concurrent commits
    *     serialize cleanly in either order, so they simply land —
    *     the same serializability contract Delta documents;
    *  3. land the delta (plain append) and return the landed id.
    *
    * Scale: the claim is one marker create; conflict detection lists
    * the (readVersion, target) window driver-side and key-joins ONLY
    * those commit directories against the delta's keys — O(commits
    * landed since the read), never O(table).
    */
  /** The OCC conflict window shared by [[commitWithRetry]] and the
    * row-level DML writes: the landed commits in `(readVersion,
    * target)` whose rows intersect `deltaKeys` — empty means the
    * claimed `target` serializes cleanly after the read. The window is
    * every id CLAIMED OR LANDED since the read: a claimed-but-still-
    * writing commit's keys are unknowable, so each in-flight window id
    * is awaited until its data lands (direct landings finish with
    * `_SUCCESS`; append landings show their data files at job commit)
    * or its claim is released (a refused writer deletes its claim). A
    * claimant that crashed before landing blocks the window — bounded
    * wait, then loud failure naming the id (the operator clears the
    * orphaned claim; silently skipping it could lose a conflict).
    * Base commits are pure rewrites — they conflict with nothing.
    * Driver-side listing + ONE key-semi-join over only the window's
    * directories: O(commits landed since the read), never O(table).
    */
  private[graft] def conflictingCommits(spark: SparkSession, path: String,
                                        keys: Seq[String],
                                        deltaKeys: DataFrame,
                                        readVersion: Long,
                                        target: Long): Seq[Long] = {
    val bases = baseIds(path).toSet
    val windowIds = (commitIds(path) ++ claimIds(path))
      .filter(id => id > readVersion && id < target &&
        !bases.contains(id))
      .distinct.sorted
    def landed(id: Long): Boolean = {
      val dir = LogFs.child(path, s"$CommitCol=$id")
      LogFs.exists(LogFs.child(dir, "_SUCCESS")) ||
        LogFs.list(dir).exists(s =>
          s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    val landedSince = windowIds.filter { id =>
      val deadline = System.currentTimeMillis() + 60000L
      var in = landed(id)
      var claimed = claimHolder(path, id).isDefined
      while (!in && claimed) {
        require(System.currentTimeMillis() < deadline,
          s"commit $id of $path has been claimed but unlanded for " +
            "60s — its writer likely crashed mid-commit; clear the " +
            s"orphaned ${ClaimPrefix}$id marker to unblock writers")
        Thread.sleep(25L)
        in = landed(id)
        claimed = claimHolder(path, id).isDefined
      }
      in
    }
    if (landedSince.isEmpty) Nil
    else {
      val landedDf = spark.read.option("basePath", path).parquet(
        landedSince.map(id =>
          LogFs.child(path, s"$CommitCol=$id")): _*)
      val clash = landedDf.select(keys.map(col): _*)
        .join(deltaKeys.select(keys.map(col): _*), keys, "left_semi")
      if (clash.isEmpty) Nil else landedSince
    }
  }

  /** Release a claim marker whose id was never landed — the refused
    * writer's cleanup (leaving it would poison the id for every later
    * writer).
    */
  private[graft] def releaseClaim(path: String, commitId: Long): Unit =
    LogFs.delete(LogFs.child(path, s"$ClaimPrefix$commitId"))

  def commitWithRetry(spark: SparkSession, path: String, keys: Seq[String],
                      delta: DataFrame, readVersion: Long, writer: String,
                      maxAttempts: Int = 5): Long = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    require(!delta.columns.contains(CommitCol),
      s"Changelog reserves column name $CommitCol; rename it on the input")
    requireMatchingShape(delta, path)
    var floor = math.max(commitIds(path).foldLeft(-1L)(math.max),
      readVersion)
    var attempt = 0
    while (true) {
      attempt += 1
      val target = floor + 1
      if (LogFs.claimExclusive(
          LogFs.child(path, s"$ClaimPrefix$target"), writer)) {
        val clashIds = conflictingCommits(spark, path, keys,
          delta.select(keys.map(col): _*), readVersion, target)
        if (clashIds.nonEmpty) {
          releaseClaim(path, target)
          require(false,
            s"conflict: commits [${clashIds.mkString(", ")}] landed " +
              s"since writer '$writer' read version $readVersion of " +
              s"$path and touch this delta's keys — blind landing " +
              "would lose those updates; re-derive the delta against " +
              "the new head and commit again")
        }
        // land DIRECTLY into the claimed commit directory (partition
        // value rides on the dir name, like every partitioned write):
        // the claim guarantees this writer owns the dir, and a direct
        // write gives each concurrent writer its OWN job-staging
        // namespace — a shared-root append would collide in the
        // committer's `_temporary/0` under exactly the concurrency
        // this method exists for
        withConstraintChecks(delta, path).write.mode("overwrite")
          .parquet(LogFs.child(path, s"$CommitCol=$target"))
        writeCommitInfo(path, target, "occ-append", writer)
        return target
      }
      // claim lost: another writer is landing `target` — advance past
      // it (the head listing may not show its directory yet)
      floor = target
      require(attempt < maxAttempts,
        s"writer '$writer' lost the commit claim $maxAttempts times in " +
          s"a row on $path — contention is pathological; back off and " +
          "retry commitWithRetry from a fresh read")
    }
    -1L // unreachable
  }

  /** Plain-log reads must never run against an OPS log: the plain
    * compaction would surface tombstones as ordinary rows (a delete
    * silently becomes an update-to-null) and the plain feed would
    * mislabel them. The schema is already on the lazy frame — the
    * check costs nothing beyond the footer read the caller is about
    * to do anyway.
    */
  private def requirePlainLog(df: DataFrame, path: String): DataFrame = {
    require(!df.columns.contains(OpCol),
      s"$path is an OPS log (has $OpCol) — use snapshotAtOps/" +
        "changesBetweenOps/checkpointOps, or tombstones would read " +
        "as ordinary rows")
    df
  }

  /** The table as of commit `v` (inclusive): keyed last-write-wins over
    * the partition-pruned commits ≤ v. Returns the data columns only —
    * `_commit` is the log's coordinate, not the table's.
    */
  def snapshotAt(spark: SparkSession, path: String, keys: Seq[String],
                 v: Long): DataFrame = {
    requireAboveHorizon(path, v, "snapshot version")
    Upsert.latestByKey(
      requirePlainLog(spark.read.parquet(path), path)
        .filter(col(CommitCol) <= v),
      keys, col(CommitCol)).drop(CommitCol)
  }

  /** Latest committed snapshot (AS OF the max commit id present). */
  def snapshotLatest(spark: SparkSession, path: String,
                     keys: Seq[String]): DataFrame =
    Upsert.latestByKey(requirePlainLog(spark.read.parquet(path), path),
        keys, col(CommitCol))
      .drop(CommitCol)

  /** CHANGE DATA FEED between two snapshots — every key whose tracked
    * columns differ between AS OF `v0` and AS OF `v1`, labeled
    * `insert` (no v0 version) or `update`, with old/new values side
    * by side. The lakehouse "what changed since release v0" query,
    * computed the changelog-native way: O(delta), never two full
    * snapshots diffed.
    *
    *  - candidate keys come ONLY from commits in (v0, v1] (partition-
    *    pruned — a key untouched in the window cannot have changed and
    *    is never read);
    *  - both endpoint states are `latestByKey` over commits ≤ v
    *    SEMI-JOINED to the candidates first, so the LWW compaction
    *    runs on O(touched × history-per-key), not the table;
    *  - a candidate whose tracked columns come out equal (a commit
    *    rewrote the row byte-identically, or touched only untracked
    *    columns) is SUPPRESSED — the no-op-churn filter every CDC
    *    consumer wants; null-safe compare, so null→x, x→null are
    *    changes and null→null is not.
    *
    * `trackCols` scopes the diff to the measures the consumer cares
    * about (the common CDC shape); pass all non-key columns for a
    * whole-row feed. Deletes cannot occur in an append-only LWW log
    * (no tombstones), so the feed is insert/update only.
    *
    * Plan shape: three pruned passes over the log (candidates, then
    * one compaction per endpoint), each O(delta)-bounded by the
    * semi-join — deliberately NOT materialized between passes: the
    * read is side-effect-free, so re-derivation is merely repeated
    * pruned IO, and keeping the plan lazy lets AQE size each pass
    * independently (a checkpoint here would trade that for executor-
    * block durability the result does not need).
    */
  def changesBetween(spark: SparkSession, path: String,
                     keys: Seq[String], v0: Long, v1: Long,
                     trackCols: Seq[String]): DataFrame = {
    require(v0 < v1, s"need v0 < v1, got $v0 >= $v1")
    requireAboveHorizon(path, v0, "change-feed start version v0")
    // loud contract on generated names (the strideOrder discipline):
    // a key named change_type / _had_old, or a tracked column whose
    // old_/new_ form collides with a key, would silently clobber
    val generated = Set("change_type", "_had_old") ++
      trackCols.flatMap(c => Seq(s"old_$c", s"new_$c"))
    require(keys.forall(!generated.contains(_)),
      s"key columns collide with generated feed columns: " +
        keys.filter(generated.contains).mkString(", "))
    val log = requirePlainLog(spark.read.parquet(path), path)
    val touched = log
      .filter(col(CommitCol) > v0 && col(CommitCol) <= v1)
      .select(keys.map(col): _*).distinct()
    def stateAt(v: Long) = Upsert.latestByKey(
      log.filter(col(CommitCol) <= v).join(touched, keys, "left_semi"),
      keys, col(CommitCol))
    val newSide = stateAt(v1).select(
      keys.map(col) ++ trackCols.map(c => col(c).as(s"new_$c")): _*)
    val oldSide = stateAt(v0).select(
      keys.map(col) ++ trackCols.map(c => col(c).as(s"old_$c")) :+
        lit(true).as("_had_old"): _*)
    val changed = trackCols
      .map(c => differsNullSafe(col(s"old_$c"), col(s"new_$c"),
        log.schema(c).dataType))
      .reduce(_ || _)
    newSide.join(oldSide, keys, "left")
      .filter(col("_had_old").isNull || changed)
      .withColumn("change_type",
        when(col("_had_old").isNull, lit("insert")).otherwise(lit("update")))
      .drop("_had_old")
  }

  /** [[snapshotAt]] under SCHEMA EVOLUTION: commits may carry different
    * column sets (columns added over the log's life — the drift every
    * long-lived table suffers); `mergeSchema` folds the commit dirs
    * into the union schema, rows from pre-evolution commits null-fill
    * the later columns, and the keyed LWW compaction then works
    * unchanged (the payload struct simply carries the widened set). A
    * SEPARATE entry point on purpose: schema merging reads every
    * file's footer up front, a planning cost the fixed-schema read
    * path must not silently pay; callers opt in when their log has
    * actually evolved. Columns can only be ADDED — a type change or
    * rename is a new table, the same rule every lakehouse format
    * enforces without column-mapping metadata.
    */
  def snapshotAtEvolved(spark: SparkSession, path: String,
                        keys: Seq[String], v: Long): DataFrame = {
    requireAboveHorizon(path, v, "snapshot version")
    Upsert.latestByKey(
      requirePlainLog(
        spark.read.option("mergeSchema", "true").parquet(path), path)
        .filter(col(CommitCol) <= v),
      keys, col(CommitCol)).drop(CommitCol)
  }

  // ---- Ops log: the DELETE path (tombstones) ------------------------
  //
  // The plain changelog above is append-only last-write-wins — deletes
  // cannot occur (changesBetween's feed is insert/update only). The
  // OPS log closes that hole the way every lakehouse format does:
  // each row carries an operation column (`_op` = "u" upsert / "d"
  // delete tombstone), a snapshot is the keyed LWW compaction with
  // tombstoned keys filtered OUT, and the change feed gains the
  // `delete` label. Tombstones are ordinary rows — a delete commit is
  // still O(delta) appended metadata+keys, snapshots still partition-
  // prune and compact with the same max_by kernel (the filter is one
  // predicate AFTER the per-key reduction, so a key deleted then
  // re-inserted resolves purely by commit order), and checkpointing
  // PHYSICALLY ERASES tombstoned history: the fold keeps only live
  // rows, so after `checkpointOps(v)` no file below the horizon holds
  // the deleted rows' data — the right-to-be-forgotten guarantee a
  // logical tombstone alone never gives.

  val OpCol = "_op"

  /** Ops-compaction version order: (commit id, op rank) with the
    * TOMBSTONE ranked ABOVE the upsert at equal commit id. A single
    * commit carrying both an upsert and a tombstone for one key is a
    * realistic interleave (a streaming CDC micro-batch mixing an
    * update and a later delete of the same key, landed under one
    * batchId) and `max_by` alone would tie arbitrarily — whether the
    * key survived would be nondeterministic. Precedence is DELETE
    * WINS: deterministic, and the conservative reading of "the batch's
    * last word on this key included a delete". Callers who need
    * intra-commit ordering finer than that must split the commit.
    */
  private def opsVersion: org.apache.spark.sql.Column =
    struct(col(CommitCol),
      when(col(OpCol) === "d", lit(1)).otherwise(lit(0)))

  /** Append `delta` as UPSERT rows of ops-commit `commitId`. */
  def commitUpsert(delta: DataFrame, path: String, commitId: Long,
                   writer: String = SoloWriter): Unit = {
    require(!delta.columns.contains(OpCol),
      s"Changelog reserves column name $OpCol; rename it on the input")
    commitVerbed(delta.withColumn(OpCol, lit("u")), path, commitId, writer,
      "upsert")
  }

  /** Append TOMBSTONES for `keys` as ops-commit `commitId`. The keys
    * frame must hold exactly the key columns; every data column is
    * null-filled from the log's OWN schema (footer-only planning — a
    * delete can only target an existing log, and deriving the schema
    * from the log means a caller cannot commit tombstones whose shape
    * silently diverges from the table's).
    */
  def commitDelete(spark: SparkSession, keys: DataFrame, path: String,
                   commitId: Long): Unit = {
    // union schema on purpose: after evolution a single-footer read
    // could derive a pre-evolution tombstone shape; deletes are rare
    // enough that the footer-merge planning cost is the right trade
    val schema = spark.read.option("mergeSchema", "true").parquet(path).schema
    require(schema.fieldNames.contains(OpCol),
      s"$path is not an ops log (no $OpCol column) — deletes need " +
        "commitUpsert/commitDelete from the start")
    val keyCols = keys.columns.toSet
    require(keyCols.subsetOf(schema.fieldNames.toSet),
      s"tombstone keys [${keys.columns.mkString(", ")}] not all present " +
        s"in the log schema [${schema.fieldNames.mkString(", ")}]")
    // type equality is part of the contract: a diverging key type
    // (IntegerType keys into a LongType log) would append a commit
    // whose parquet physical type differs from the rest of the log,
    // silently poisoning later single-footer reads — fail loudly, the
    // caller casts
    keys.schema.fields.foreach { kf =>
      val logType = schema(kf.name).dataType
      require(kf.dataType == logType,
        s"tombstone key ${kf.name} has type ${kf.dataType} but the log " +
          s"stores $logType — cast the keys frame to the log's type")
    }
    val full = schema.fields
      .filter(f => f.name != CommitCol && f.name != OpCol)
      .map { f =>
        if (keyCols.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
    commitVerbed(keys.select(full.toIndexedSeq: _*)
      .withColumn(OpCol, lit("d")), path, commitId, SoloWriter, "delete")
  }

  /** The mirror guard: ops reads against a PLAIN log fail with the
    * API pointer, not an unresolved-column error.
    */
  private def requireOpsLog(df: DataFrame, path: String): DataFrame = {
    require(df.columns.contains(OpCol),
      s"$path is not an ops log (no $OpCol column) — use snapshotAt/" +
        "changesBetween/checkpoint, or build it with commitUpsert/" +
        "commitDelete")
    df
  }

  // ---- Base commits: OPTIMIZE without losing history ----------------
  //
  // A `_graft_base_<id>` marker declares commit id a SELF-CONTAINED
  // base: the commit holds the COMPLETE live state as of itself (a
  // pure rewrite — zero logical changes, Delta's dataChange=false).
  // Three read-path consequences, each sound because the base is
  // complete and change-free:
  //  - snapshots/lookups at w ≥ base need only commits in [base, w] —
  //    every key untouched since the base has its row IN the base, and
  //    a key dead at the base is absent from it and stays dead unless
  //    re-inserted later (partition-pruned: at a 10k-commit log the
  //    post-OPTIMIZE read cost is O(commits since the base));
  //  - change feeds EXCLUDE base ids from the candidate scan — a pure
  //    rewrite contains no changes, and without the exclusion a window
  //    crossing the base would scan the whole table as "touched"
  //    (every candidate then suppressed: correct, but O(table));
  //  - commitWithRetry's conflict detection ignores base ids — a
  //    rewrite conflicts with nothing.
  // Markers are swept with their commits by the vacuum and travel with
  // clones, like stats markers.

  private val BasePrefix = "_graft_base_"

  /** All base-commit ids of the log, ascending. */
  def baseIds(path: String): Seq[Long] =
    LogFs.list(path)
      .filter(s => s.isFile && s.getPath.getName.startsWith(BasePrefix))
      .map(_.getPath.getName.stripPrefix(BasePrefix).toLong).sorted

  /** The newest base at or below `v` (reads at v start here). */
  private def baseFloor(path: String, v: Long): Long =
    baseIds(path).filter(_ <= v).foldLeft(Long.MinValue)(math.max)

  /** OPTIMIZE AT HEAD WITHOUT LOSING HISTORY — the maintenance verb
    * [[checkpointOpsClustered]] deliberately is not: recluster the
    * current live state into ONE new commit `newCommitId` (landed via
    * [[ZOrderLayout.rangeClustered]]: `numFiles` files placed by the
    * arithmetic range of `clusterCol`, sorted within each), marked as
    * a BASE, with its commit-stats marker written — while EVERY
    * historical version stays readable (no horizon advance, no
    * vacuum; a later [[checkpointOps]] reclaims the superseded
    * history when retention allows). The base is a pure rewrite:
    * snapshots at any w (before or after `newCommitId`) are
    * value-identical to pre-OPTIMIZE reads, feeds skip it, and reads
    * at the optimized head prune to `[newCommitId, head]` commits and
    * then to the key-range files within the base — commit skipping,
    * base pruning, and parquet row-group skipping compose.
    *
    * Lands under `writer`'s claim like any commit (the id is NEW —
    * a concurrent writer racing it loses or wins the claim loudly).
    * `clusterCol` must be a key column (the stats precondition) with
    * non-negative long values in `[0, domain)` on every live row.
    */
  def optimizeOps(spark: SparkSession, path: String, keys: Seq[String],
                  newCommitId: Long, clusterCol: String, domain: Long,
                  numFiles: Int, writer: String = SoloWriter): Unit = {
    require(keys.contains(clusterCol),
      s"clusterCol $clusterCol must be one of the key columns " +
        s"[${keys.mkString(", ")}] — the base's stats marker feeds " +
        "rangeLookupOps, whose skipping is only sound on a key column")
    optimizeLanding(spark, path, keys, newCommitId, writer,
      statsCols = Seq(clusterCol))(
      ZOrderLayout.rangeClustered(_, clusterCol, domain, numFiles))
  }

  /** [[optimizeOps]] for a STRING cluster key — the documents-log shape
    * (q218): placement is exact equal-depth in UTF-8 key order via the
    * q188 bucketed-prefix rank kernel
    * ([[ZOrderLayout.rankClusteredString]] — no single-task sort, no
    * sampling), the remaining key columns break ties so the order is
    * total, and the base's multi-column stats marker records the
    * string min/max that [[rangeLookupOpsString]] skips by. Same
    * contract as the numeric form: a pure rewrite under the
    * maintenance mutex, history intact, snapshots value-identical.
    */
  def optimizeOpsString(spark: SparkSession, path: String,
                        keys: Seq[String], newCommitId: Long,
                        clusterCol: String, numFiles: Int,
                        writer: String = SoloWriter): Unit = {
    require(keys.contains(clusterCol),
      s"clusterCol $clusterCol must be one of the key columns " +
        s"[${keys.mkString(", ")}] — the base's stats marker feeds " +
        "rangeLookupOpsString, whose skipping is only sound on a key " +
        "column")
    optimizeLanding(spark, path, keys, newCommitId, writer,
      statsCols = Seq(clusterCol))(
      ZOrderLayout.rankClusteredString(_, clusterCol, numFiles,
        tieBreakCols = keys.filterNot(_ == clusterCol)))
  }

  /** [[optimizeOps]] on TWO cluster dimensions — the 2-D
    * [[ZOrderLayout]] placement wired into the ops-log base fold: the
    * live state lands as `numFiles` files placed by the arithmetic
    * range of the Morton interleave of (xCol, yCol), so box predicates
    * over BOTH dimensions prune files (the q73 slice law, now on the
    * table format's base), and the base's stats marker records BOTH
    * columns' min/max (the q202 multi-column form) so commit-level
    * skipping works on either dimension. Both columns must be key
    * columns (non-null by construction; the skipping soundness rule)
    * with values in `[0, 2^bits)`.
    */
  def optimizeOpsZOrder(spark: SparkSession, path: String,
                        keys: Seq[String], newCommitId: Long,
                        xCol: String, yCol: String, bits: Int,
                        numFiles: Int, writer: String = SoloWriter): Unit = {
    Seq(xCol, yCol).foreach { c =>
      require(keys.contains(c),
        s"z-order column $c must be one of the key columns " +
          s"[${keys.mkString(", ")}] — the base's stats marker feeds " +
          "the range lookups, whose skipping is only sound on key " +
          "columns")
    }
    optimizeLanding(spark, path, keys, newCommitId, writer,
      statsCols = Seq(xCol, yCol))(
      ZOrderLayout.zClustered(_, xCol, yCol, bits, numFiles))
  }

  /** The shared OPTIMIZE landing: fold the live head state, place it
    * with `place`, land under the claim + maintenance mutex, record
    * the stats/base/info markers. Marker ORDER is the crash-safety
    * law: stats before base. A crash after the data landed but before
    * the markers leaves an ordinary (unmarked) commit — reads stay
    * correct, only un-pruned; re-run under the same id to finish (the
    * claim is held by this writer).
    */
  private def optimizeLanding(spark: SparkSession, path: String,
                              keys: Seq[String], newCommitId: Long,
                              writer: String, statsCols: Seq[String])
                             (place: DataFrame => DataFrame): Unit =
      withMaintenanceMutex(path, s"optimize@$newCommitId:$writer") {
    val ids = commitIds(path)
    require(ids.nonEmpty, s"$path has no commits to optimize")
    val head = ids.max
    require(newCommitId > head,
      s"optimize must land as a NEW commit above the head $head of " +
        s"$path, got $newCommitId — rewriting an existing commit would " +
        "destroy the changes it carried")
    claimCommit(path, newCommitId, writer)
    val staging = s"${path.stripSuffix("/")}__opt_staging_v$newCommitId"
    LogFs.delete(staging)
    // the base is a pure rewrite of the live state — logically-dropped
    // columns are projected out of it (the checkpoint fold's reclaim
    // law: every read served FROM the base is at/above the base, and
    // drops only accumulate, so no reachable read wants those bytes;
    // reads below the base open the original commits, untouched)
    reclaimDropped(snapshotAtOpsEvolved(spark, path, keys, head),
      path, head)
      .withColumn(OpCol, lit("u"))
      .write.mode("overwrite").parquet(staging)
    val staged = spark.read.parquet(staging)
    val dir = LogFs.child(path, s"$CommitCol=$newCommitId")
    if (staged.isEmpty) staged.write.mode("overwrite").parquet(dir)
    else place(staged).write.mode("overwrite").parquet(dir)
    if (!staged.isEmpty) writeCommitStatsMulti(spark, path, newCommitId,
      statsCols)
    LogFs.writeAtomic(LogFs.child(path, s"$BasePrefix$newCommitId"),
      newCommitId.toString)
    writeCommitInfo(path, newCommitId, "optimize", writer)
    LogFs.delete(staging)
  }

  /** `df` pruned to the commits a read AS OF `v` must consider:
    * `[newest base ≤ v, v]` — both partition filters, so pre-base
    * commit directories are never opened.
    */
  /** `!(a <=> b)` for a column of type `dt`, with MAP types
    * canonicalized first: `<=>` cannot order maps (SQL defines no map
    * ordering), but a map's entries sorted by key are a faithful
    * orderable image (keys are unique), so equality on the image IS
    * map equality. Recurses through array elements, struct fields,
    * and map values, so nested maps compare too; map-free types pass
    * through untouched (zero plan change on every pre-existing
    * schema). Null maps stay null under `map_entries`/`transform`/
    * `sort_array`, so the null-safe semantics are preserved.
    */
  private[graft] def differsNullSafe(a: Column, b: Column,
                                     dt: org.apache.spark.sql.types.DataType)
      : Column = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    def hasMap(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: MapType => true
      case ArrayType(et, _) => hasMap(et)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    def canon(c: Column,
              t: org.apache.spark.sql.types.DataType): Column = t match {
      case MapType(kt, vt, _) =>
        sort_array(transform(map_entries(c), e =>
          struct(canon(e.getField("key"), kt).as("key"),
            canon(e.getField("value"), vt).as("value"))))
      case ArrayType(et, _) if hasMap(et) =>
        transform(c, x => canon(x, et))
      case s: StructType if s.fields.exists(f => hasMap(f.dataType)) =>
        struct(s.fields.toIndexedSeq.map(f =>
          canon(c.getField(f.name), f.dataType).as(f.name)): _*)
      case _ => c
    }
    if (hasMap(dt)) !(canon(a, dt) <=> canon(b, dt)) else !(a <=> b)
  }

  private def opsWindow(df: DataFrame, path: String, v: Long): DataFrame = {
    val floor = baseFloor(path, v)
    val upTo = df.filter(col(CommitCol) <= v)
    if (floor == Long.MinValue) upTo
    else upTo.filter(col(CommitCol) >= floor)
  }

  /** The ops table as of commit `v`: keyed LWW over pruned commits,
    * tombstoned keys REMOVED. Data columns only. Commits below the
    * newest base ≤ v are pruned out (the base holds their surviving
    * effect — see the base-commit contract above).
    */
  def snapshotAtOps(spark: SparkSession, path: String, keys: Seq[String],
                    v: Long): DataFrame = {
    requireAboveHorizon(path, v, "snapshot version")
    Upsert.latestByKey(
      opsWindow(requireOpsLog(spark.read.parquet(path), path), path, v),
      keys, opsVersion)
      .filter(col(OpCol) === "u")
      .drop(CommitCol, OpCol)
  }

  /** [[snapshotAtEvolved]] for the ops log: same union-schema fold
    * (columns only ever ADDED; pre-evolution rows null-fill), same
    * separate-entry-point rule (footer-merge planning is opt-in), and
    * the liveness filter works unchanged — `_op` is present in every
    * commit by construction, so evolution can never strand a
    * tombstone. Pairs with [[checkpointOps]], whose fold already
    * reads mergeSchema for exactly this case (a single-footer fold
    * would silently drop later-added columns, then vacuum the only
    * copy).
    */
  def snapshotAtOpsEvolved(spark: SparkSession, path: String,
                           keys: Seq[String], v: Long): DataFrame = {
    requireAboveHorizon(path, v, "snapshot version")
    Upsert.latestByKey(
      opsWindow(requireOpsLog(
        spark.read.option("mergeSchema", "true").parquet(path), path),
        path, v),
      keys, opsVersion)
      .filter(col(OpCol) === "u")
      .drop(CommitCol, OpCol)
  }

  /** [[changesBetween]] for the ops log — the full CDC label set
    * (insert / update / delete), NET semantics between the two
    * snapshots (a key deleted AND re-inserted inside the window
    * reports as one update/insert, the churn every CDC consumer
    * wants collapsed):
    *  - candidates only from commits in (v0, v1] (partition-pruned);
    *  - old live → new live, tracked differ → `update` (equal →
    *    suppressed);
    *  - old absent-or-tombstoned → new live → `insert`;
    *  - old live → new tombstoned → `delete` (old values carried,
    *    new side null — the downstream retraction needs the olds);
    *  - dead on both sides → suppressed.
    */
  def changesBetweenOps(spark: SparkSession, path: String,
                        keys: Seq[String], v0: Long, v1: Long,
                        trackCols: Seq[String],
                        keyFilter: Option[String] = None): DataFrame = {
    require(v0 < v1, s"need v0 < v1, got $v0 >= $v1")
    requireAboveHorizon(path, v0, "change-feed start version v0")
    val generated = Set("change_type", "_old_live", "_new_live") ++
      trackCols.flatMap(c => Seq(s"old_$c", s"new_$c"))
    require(keys.forall(!generated.contains(_)),
      s"key columns collide with generated feed columns: " +
        keys.filter(generated.contains).mkString(", "))
    val log = requireOpsLog(spark.read.parquet(path), path)
    // base commits are pure rewrites (zero changes): excluding them
    // from the candidate scan keeps the feed O(delta) across an
    // OPTIMIZE — without it, a window containing a base would treat
    // the whole table as touched (then suppress every no-op: correct
    // but O(table))
    val basesInWindow = baseIds(path).filter(id => id > v0 && id <= v1)
    val candidateCommits = {
      val window = col(CommitCol) > v0 && col(CommitCol) <= v1
      if (basesInWindow.isEmpty) window
      else window && !col(CommitCol).isin(basesInWindow: _*)
    }
    // keyFilter is the SELECTIVE-feed knob (one tenant's keys out of a
    // shared log): a boolean SQL expression over the KEY columns,
    // applied to the touched-key set BEFORE the two endpoint
    // compactions — both left_semi joins then carry only matching
    // keys, so a consumer of an f-fraction slice pays O(f · delta),
    // not O(delta)-then-filter. Equivalent to filtering the full feed
    // (each key's labels are independent of other keys) — spec-pinned.
    // The key-columns-only precondition is checked by PARSING the
    // expression's references, not by trusting analysis: Spark's
    // ResolveMissingReferences would happily resolve a non-key column
    // back THROUGH the projection and filter by pre-compaction row
    // values — silently wrong (which version of the key's value?).
    keyFilter.foreach { f =>
      val refs = spark.sessionState.sqlParser.parseExpression(f)
        .collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.name
        }
      require(refs.nonEmpty && refs.forall(keys.contains),
        s"keyFilter may reference only the key columns " +
          s"[${keys.mkString(", ")}]; got [${refs.mkString(", ")}] — a " +
          "non-key column has no single value per key before the " +
          "compaction, so pruning by it would be silently wrong")
    }
    val touchedAll = log.filter(candidateCommits)
      .select(keys.map(col): _*).distinct()
    val touched = keyFilter.fold(touchedAll)(f => touchedAll.filter(expr(f)))
    def stateAt(v: Long) = Upsert.latestByKey(
      opsWindow(log, path, v).join(touched, keys, "left_semi"),
      keys, opsVersion)
    val newSide = stateAt(v1).select(
      keys.map(col) ++ trackCols.map(c => col(c).as(s"new_$c")) :+
        (col(OpCol) === "u").as("_new_live"): _*)
    val oldSide = stateAt(v0).select(
      keys.map(col) ++ trackCols.map(c => col(c).as(s"old_$c")) :+
        (col(OpCol) === "u").as("_old_live"): _*)
    val changed = trackCols
      .map(c => differsNullSafe(col(s"old_$c"), col(s"new_$c"),
        log.schema(c).dataType))
      .reduce(_ || _)
    val oldLive = coalesce(col("_old_live"), lit(false))
    val newLive = coalesce(col("_new_live"), lit(false))
    newSide.join(oldSide, keys, "full_outer")
      .withColumn("change_type",
        when(oldLive && newLive && changed, lit("update"))
          .when(!oldLive && newLive, lit("insert"))
          .when(oldLive && !newLive, lit("delete")))
      .filter(col("change_type").isNotNull)
      .drop("_old_live", "_new_live")
  }

  /** [[checkpoint]] for the ops log: fold commits ≤ v into a base of
    * ONLY THE LIVE ROWS (re-tagged `u`), then vacuum below — same
    * crash-safety order (base lands before anything is destroyed).
    * Because the fold drops tombstoned keys entirely, the checkpoint
    * is also the PHYSICAL-ERASURE step: after it, no surviving file
    * holds a deleted row's data, which is what a deletion-compliance
    * clock actually measures (LayoutSpec-style byte proof in
    * TopKChangelogSpec).
    */
  /** Land the staged fold as the `_commit=v` base. The EMPTY fold
    * (every key dead at v — a legal ops-log state) needs an explicit
    * branch: a dynamic partition overwrite of ZERO rows rewrites
    * nothing, so the pre-fold `_commit=v` directory would survive the
    * vacuum and the physical-erasure guarantee would be violated for
    * exactly the data landed in commit v itself. Instead the old
    * directory is removed and a schema-bearing empty commit is written
    * in its place (the partition value rides on the directory name),
    * so the log's shape stays readable and snapshots at ≥ v read
    * empty — never a partition-discovery failure over a bare dir.
    */
  private def landFold(spark: SparkSession, staging: String, path: String,
                       v: Long): Unit = {
    val staged = spark.read.parquet(staging)
    if (staged.isEmpty) {
      val dir = LogFs.child(path, s"$CommitCol=$v")
      LogFs.delete(dir)
      staged.write.mode("overwrite").parquet(dir)
    } else overwriteCommit(staged, path, v, Nil)
    // claim-free on purpose: the fold REWRITES an id legitimately
    // claimed by whoever committed it; the checkpoint's own guard is
    // the horizon ordering (base lands → horizon → vacuum)
  }

  /** Stage the window's full LWW compaction — live rows AND the
    * window's surviving tombstones — partitioned by `_op` (tombstone
    * presence is then a directory fact, and the erasure pass reads
    * the live side pruned). The tombstones are load-bearing for
    * CONCURRENT readers: between the fold landing at `_commit=v` and
    * the vacuum of the older commits, a reader lists BOTH — without
    * the tombstones in the fold, its per-key LWW would pick a deleted
    * key's latest surviving UPSERT from a pre-vacuum commit and
    * silently resurrect it (a real interleaving, caught by the
    * checkpoint-vs-reader race spec). With them, the fold's row at
    * commit v wins for every key under any listing interleaving:
    * every completed concurrent read is correct, every stale plan
    * fails loudly on the swapped files.
    */
  private def stageFold(spark: SparkSession, path: String,
                        keys: Seq[String], v: Long,
                        staging: String): Unit = {
    LogFs.delete(staging)
    reclaimDropped(
      Upsert.latestByKey(
        opsWindow(requireOpsLog(
          spark.read.option("mergeSchema", "true").parquet(path), path),
          path, v),
        keys, opsVersion)
        .drop(CommitCol), path, v)
      .write.mode("overwrite").partitionBy(OpCol).parquet(staging)
  }

  /** PHYSICAL reclaim of logically-dropped columns at the fold
    * boundary — the DROP COLUMN half of the right-to-be-forgotten
    * contract the checkpoint already gives tombstones: a column
    * dropped at/below the fold version is PROJECTED OUT of the base,
    * so after the vacuum no surviving file below the horizon holds
    * its bytes (Delta needs an explicit REWRITE/purge pass; here the
    * fold IS the rewrite, so the reclaim is free). Sound because
    * drops only accumulate: every readable version ≥ the fold applies
    * a mapping whose dropped set contains these columns — the
    * projection removes only bytes no surviving read can reach.
    * Pre-drop commits ABOVE the fold keep their bytes (time travel
    * still owns them) until a later fold passes the drop.
    */
  private def reclaimDropped(folded: DataFrame, path: String,
                             v: Long): DataFrame =
    mappingAt(path, v).map(_.dropped).filter(_.nonEmpty) match {
      case Some(dropped) =>
        folded.drop(dropped.toSeq.filter(folded.columns.contains): _*)
      case None => folded
    }

  /** The staged fold's LIVE side, `_op` column restored. */
  private def stagedLive(spark: SparkSession, staging: String): DataFrame =
    spark.read.option("basePath", staging)
      .parquet(LogFs.child(staging, s"$OpCol=u"))

  /** Test-only interleave point, invoked right after the checkpoint's
    * phase-1 fold lands (the fold and the not-yet-vacuumed commits
    * coexist): a spec reads here to pin deterministically that a
    * concurrent snapshot over the MIXED listing is correct — the
    * tombstones carried by the phase-1 fold are what prevent deleted
    * keys from resurrecting. No-op in production.
    */
  private[graft] val testAfterFold =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](() => ())

  /** Test-only interleave point, invoked after the checkpoint's vacuum
    * and before the phase-2 erasure rewrite: a spec throws here to
    * SIMULATE the crash leg (a value-clean, tombstone-carrying base
    * that stays correct to read and whose re-run finishes the
    * erasure). No-op in production.
    */
  private[graft] val testAfterVacuum =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](() => ())

  /** Land `df` (possibly empty) as the fold at `_commit=v` — the
    * zero-row case writes the schema-bearing empty directory directly
    * (a zero-row dynamic overwrite is a silent no-op that would leave
    * the pre-fold directory to survive the vacuum).
    */
  private def landFoldFrame(df: DataFrame, path: String, v: Long): Unit =
    if (df.isEmpty) {
      val dir = LogFs.child(path, s"$CommitCol=$v")
      LogFs.delete(dir)
      df.write.mode("overwrite").parquet(dir)
    } else overwriteCommit(df, path, v, Nil)

  def checkpointOps(spark: SparkSession, path: String, keys: Seq[String],
                    v: Long): Unit =
      withMaintenanceMutex(path, s"checkpointOps@$v") {
    requireAboveHorizon(path, v, "checkpoint version")
    val staging = s"${path.stripSuffix("/")}__ckpt_staging_v$v"
    stageFold(spark, path, keys, v, staging)
    val hasLive = LogFs.exists(LogFs.child(staging, s"$OpCol=u"))
    val hasDead = LogFs.exists(LogFs.child(staging, s"$OpCol=d"))
    // phase 1: land live ∪ tombstones (concurrent readers stay
    // correct while the fold and the pre-vacuum commits coexist). A
    // ZERO-ROW window (every commit in it empty) leaves no staging
    // partition dirs to read — land the schema-bearing empty base
    // from the log's own schema.
    if (!hasLive && !hasDead)
      landFoldFrame(
        reclaimDropped(
          requireOpsLog(spark.read.option("mergeSchema", "true")
            .parquet(path), path).drop(CommitCol).limit(0), path, v),
        path, v)
    else landFold(spark, staging, path, v)
    testAfterFold.get()()
    // the fold REWROTE _commit=v: its pre-fold info marker no longer
    // describes the directory — re-record as the checkpoint's own verb
    writeCommitInfo(path, v, "checkpoint", SoloWriter)
    // horizon lands AFTER the base and BEFORE the vacuum: a crash here
    // leaves reads below v failing loudly over still-intact history
    // (re-run to finish) — never erased history with a silent read path
    writeHorizon(path, v)
    vacuumBelow(path, v)
    testAfterVacuum.get()()
    // phase 2 (erasure): with the history vacuumed the tombstones are
    // inert — rewrite the base LIVE-ONLY so no surviving file holds
    // even a deleted key (the physical-erasure contract). Skipped when
    // the window had no deletes (a directory fact — zero extra cost on
    // the delete-free checkpoint). A crash between the vacuum and here
    // leaves a value-clean base whose tombstones the next checkpoint's
    // own phase 2 erases; readers stay correct throughout (a tombstone
    // in the base deletes exactly like a tombstone in a delta).
    if (hasDead) {
      landFoldFrame(
        if (hasLive) stagedLive(spark, staging)
        else spark.read.option("basePath", staging)
          .parquet(LogFs.child(staging, s"$OpCol=d")).limit(0),
        path, v)
      writeCommitInfo(path, v, "checkpoint", SoloWriter)
    }
    LogFs.delete(staging)
  }

  /** [[checkpointOps]] with the folded base CLUSTERED on `clusterCol`
    * — the lakehouse OPTIMIZE pass fused into the checkpoint: the
    * live-rows fold lands as `numFiles` files placed by the arithmetic
    * key range ([[ZOrderLayout.rangeClustered]] — seed-free, no
    * sampling pass), sorted on the key within each file, so downstream
    * key-range reads over the base prune to the files whose min/max
    * span the range instead of touching every file. Content is
    * byte-equal to [[checkpointOps]] (clustering moves rows between
    * files, never changes them); crash-safety order is identical
    * (durable staging copy → dynamic-overwrite landing that swaps at
    * job commit → horizon → vacuum). `clusterCol` must be a
    * non-negative long in `[0, domain)` and non-null on every live row
    * (a key column always is). At 100 TB this is the difference
    * between a maintenance job's point/range re-reads scanning the
    * whole base and scanning range/width files of it — and because the
    * placement is arithmetic, successive checkpoints put the same key
    * ranges in the same file slots, so downstream caches stay warm
    * across maintenance cycles.
    */
  def checkpointOpsClustered(spark: SparkSession, path: String,
                             keys: Seq[String], v: Long, clusterCol: String,
                             domain: Long, numFiles: Int): Unit =
      withMaintenanceMutex(path, s"checkpointOpsClustered@$v") {
    requireAboveHorizon(path, v, "checkpoint version")
    val staging = s"${path.stripSuffix("/")}__ckpt_staging_v$v"
    stageFold(spark, path, keys, v, staging)
    val hasLive = LogFs.exists(LogFs.child(staging, s"$OpCol=u"))
    val hasDead = LogFs.exists(LogFs.child(staging, s"$OpCol=d"))
    // cluster + land: one file per arithmetic key range inside the
    // _commit=v directory; the dynamic overwrite swaps at job commit,
    // and no shuffle sits between the placement and the write (the
    // partition-column sort the writer inserts is on a constant).
    def landClustered(df: DataFrame): Unit =
      ZOrderLayout.rangeClustered(df, clusterCol, domain, numFiles)
        .withColumn(CommitCol, lit(v))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(CommitCol).parquet(path)
    // phase 1: with deletes in the window, land the PLAIN live ∪
    // tombstone fold (what concurrent readers need while the
    // pre-vacuum commits are still listed — see checkpointOps); the
    // clustered live-only landing is then the phase-2 erasure rewrite.
    // Without deletes, cluster directly in one landing.
    if (!hasLive && !hasDead)
      landFoldFrame(
        reclaimDropped(
          requireOpsLog(spark.read.option("mergeSchema", "true")
            .parquet(path), path).drop(CommitCol).limit(0), path, v),
        path, v)
    else if (!hasDead) landClustered(stagedLive(spark, staging))
    else landFold(spark, staging, path, v)
    writeCommitInfo(path, v, "checkpoint", SoloWriter)
    writeHorizon(path, v)
    vacuumBelow(path, v)
    if (hasDead) {
      if (hasLive) landClustered(stagedLive(spark, staging))
      else landFoldFrame(
        spark.read.option("basePath", staging)
          .parquet(LogFs.child(staging, s"$OpCol=d")).limit(0),
        path, v)
      writeCommitInfo(path, v, "checkpoint", SoloWriter)
    }
    LogFs.delete(staging)
  }

  /** STANDALONE RETENTION — the second half of Delta's
    * OPTIMIZE-then-VACUUM decomposition: [[optimizeOps]] (or any
    * base-marked rewrite) lands the live fold as a NEW commit while
    * every historical version stays readable; this verb later
    * RECLAIMS that history when retention allows — horizon + vacuum
    * below the newest base ≤ `retainVersion`, with NO fold of its own
    * (the base IS the fold, so nothing is read or rewritten — cost is
    * O(reclaimed directories), zero data jobs at any scale). Refuses
    * loudly when `retainVersion` exceeds the head, and when no base
    * exists at or below it — vacuuming un-folded history would
    * destroy live state (land an optimize first, or use
    * [[checkpointOps]] which folds and vacuums in one pass). After
    * it: snapshots at/above the base are byte-identical (reads there
    * start at the base floor and never opened the reclaimed
    * directories), reads below fail loudly through the horizon guard,
    * and the reclaimed directories are physically gone. The base's
    * own stats marker SURVIVES (the directory was not rewritten — its
    * ranges still bound it, so rangeLookup pruning stays armed).
    * Idempotent: a re-run finds nothing left to sweep. Runs under the
    * maintenance mutex like every verb that rewrites shared state.
    */
  def vacuumRetain(path: String, retainVersion: Long): Unit =
      withMaintenanceMutex(path, s"vacuumRetain@$retainVersion") {
    val head = headVersion(path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no commits — nothing to vacuum"))
    require(retainVersion <= head,
      s"retain_version $retainVersion exceeds the head $head of $path " +
        "— retention cannot be promised above versions that exist")
    val b = baseFloor(path, retainVersion)
    require(b != Long.MinValue,
      s"no base commit at or below $retainVersion of $path — vacuum " +
        "reclaims history BELOW a fold, never un-folded commits " +
        "(deleting them would destroy live state); land a base first " +
        "(optimizeOps / CALL system.optimize keeps history readable " +
        "until this verb reclaims it) or use checkpointOps, which " +
        "folds and vacuums in one pass")
    writeHorizon(path, b)
    vacuumBelow(path, b, statsAtVStale = false)
  }

  /** OPERATOR recovery for a txn slot poisoned by a crashed writer —
    * the actionable form of the loud marker-without-commit refusal in
    * the idempotent-append path: a writer that died between claiming
    * its (writer, txnVersion) marker and landing the commit leaves
    * every replay refusing until the slot is cleared. This verb
    * clears it SAFELY for each crash window:
    *  - marker still `pending:<writer>` (died before or just after
    *    claiming a commit id): retire the marker (a commit id the
    *    writer may have claimed but never recorded stays claimed —
    *    a leaked id is skipped forever, which is harmless; landing
    *    over it is what would not be);
    *  - marker records a commit id with NO landed directory (died
    *    between recording and landing): release that claim iff THIS
    *    writer holds it, then retire the marker;
    *  - the commit LANDED: refuse — a completed transaction is never
    *    resolved away (undo is `restoreOps`, not marker surgery).
    *
    * DELIBERATELY an explicit verb, never automatic: no lease or
    * marker age can PROVE a writer dead (a stalled-but-alive writer
    * past any timeout would land over a reused id — the exact
    * double-landing the exclusive claim exists to prevent), so the
    * liveness judgment belongs to the operator who can see the
    * writer's process. Runs under the maintenance mutex.
    */
  def resolveStaleTxn(path: String, writer: String,
                      txnVersion: Long): Unit =
      withMaintenanceMutex(path, s"resolveStaleTxn@${writer}_$txnVersion") {
    val marker = LogFs.child(path,
      s"${SinkMapPrefix}txn_${writer}_$txnVersion")
    require(LogFs.exists(marker),
      s"no txn marker for (writer=$writer, txnVersion=$txnVersion) on " +
        s"$path — nothing to resolve")
    val content = LogFs.readString(marker).trim
    content.toLongOption match {
      case Some(id) =>
        require(!LogFs.exists(LogFs.child(path, s"$CommitCol=$id")),
          s"txn (writer=$writer, txnVersion=$txnVersion) LANDED as " +
            s"commit $id — a completed transaction is never resolved " +
            "away; roll the TABLE back with restoreOps if you must " +
            "undo it")
        claimHolder(path, id).foreach { h =>
          require(h == writer,
            s"commit $id's claim is held by '$h', not txn writer " +
              s"'$writer' — refusing to release someone else's claim")
          releaseClaim(path, id)
        }
        LogFs.delete(marker)
      case None =>
        require(content == s"pending:$writer",
          s"unrecognized txn marker content '$content' for " +
            s"(writer=$writer, txnVersion=$txnVersion) — refusing")
        LogFs.delete(marker)
    }
  }

  /** `'yyyy-MM-dd HH:mm:ss[.SSS]'` (UTC) → epoch millis — the commit
    * clock's string spelling, shared by the table_changes TVF and the
    * timestamp-addressed maintenance verbs. Loud on anything else.
    */
  def parseUtcTimestamp(raw: String, what: String): Long =
    try java.time.LocalDateTime.parse(raw.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"$what '$raw' is not a timestamp — use " +
            "'yyyy-MM-dd HH:mm:ss[.SSS]' (UTC)")
    }

  /** [[vacuumRetain]] addressed by the CLOCK — Delta's VACUUM speaks
    * time, not versions: retain every version readable at/after
    * instant `tsMillis`, reclaim below. The instant resolves through
    * [[versionAtTimestamp]] (latest commit stamped ≤ t — the q190/
    * q243 law), then the versioned verb runs unchanged, inheriting
    * every guard: unstamped commits, instants before the first stamp,
    * no base at/below the resolved version, and the head bound. The
    * resolved version is the correct retention floor exactly because
    * a reader addressing the clock at any instant ≥ t resolves to a
    * version ≥ it.
    */
  def vacuumRetainAt(path: String, tsMillis: Long): Unit =
    vacuumRetain(path, versionAtTimestamp(path, tsMillis))

  /** Zero-copy SHALLOW CLONE of the log at version `v` — the lakehouse
    * "CREATE TABLE ... CLONE ... AS OF v" / branch primitive: `dest`
    * becomes an independent log holding exactly the commits ≤ v,
    * materialized as HARDLINKS (no data bytes copied or moved — cost
    * is O(files ≤ v) directory entries, however large the table).
    * Works for both shapes (the clone is directory-level; plain and
    * ops logs clone identically), and independence is physical:
    *  - new commits on either side land in new directories the other
    *    never reads;
    *  - a checkpoint's vacuum on either side only UNLINKS its own
    *    references — the inode survives while the other side still
    *    links it (hardlink refcounting IS the shallow-clone retention
    *    contract: neither side can destroy bytes the other needs);
    *  - `commitIdempotent`'s dynamic overwrite on the origin replaces
    *    directory entries, never rewrites linked bytes in place, so a
    *    clone can never observe a torn origin rewrite.
    * The clone inherits the origin's horizon (history the origin
    * folded away is as unreadable through the clone — the guard
    * travels) and the commit stamps ≤ v (clock addressing keeps
    * working on the branch). Loud when `dest` already exists —
    * cloning over a live log would interleave two histories.
    */
  def cloneAt(spark: SparkSession, path: String, dest: String,
              v: Long): Unit = {
    val h0 = horizonOf(path)
    requireAboveHorizon(path, v, "clone version")
    require(!LogFs.exists(dest),
      s"clone destination $dest already exists — cloning over a live " +
        "log would interleave two histories; pick a fresh path")
    val src = LogFs.list(path)
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith(s"$CommitCol=") &&
          n.stripPrefix(s"$CommitCol=").toLong <= v
      }
    require(src.nonEmpty,
      s"$path has no commits <= $v to clone")
    LogFs.mkdirs(dest)
    // ZERO-COPY only where the store can express it: hardlinks need
    // local-inode semantics, so the fast path requires BOTH sides on a
    // local filesystem. Anywhere else (HDFS, object stores — no
    // hardlink primitive) the documented fallback is a recursive COPY
    // of commits ≤ v: independence still holds (separate bytes on
    // both sides), only the O(directory entries) cost profile becomes
    // O(bytes) — the same trade Delta's CLONE makes between shallow
    // (metadata-only) and deep (copied) clones.
    val zeroCopy = LogFs.isLocal(path) && LogFs.isLocal(dest)
    // a concurrent checkpoint's vacuum racing this walk usually fails
    // it loudly (a linked-from directory vanishes mid-walk), but one
    // window is silent: a directory EMPTIED between our listing and
    // its walk links zero files without error. The horizon re-check
    // below closes it — every vacuum advances the horizon FIRST, so a
    // changed horizon means some cloned directory may be torn; the
    // partial clone is removed and the failure is loud (re-run: if the
    // fold moved past v, the initial guard now refuses — correct, that
    // history is gone).
    try src.foreach { d =>
      val name = d.getPath.getName
      if (zeroCopy)
        Sinks.hardlinkTree(LogFs.localPath(d.getPath.toString),
          LogFs.localPath(LogFs.child(dest, name)))
      else LogFs.copyTree(d.getPath.toString, LogFs.child(dest, name))
    }
    catch { case t: Throwable =>
      LogFs.delete(dest)
      throw t
    }
    if (horizonOf(path) != h0) {
      LogFs.delete(dest)
      require(false,
        s"a checkpoint raced this clone of $path (horizon moved $h0 -> " +
          s"${horizonOf(path)}) — the linked commits may be torn; the " +
          "partial clone was removed, re-run against the folded log")
    }
    if (h0 != Long.MinValue) writeHorizon(dest, h0)
    commitTimestamps(path).filter(_._1 <= v).foreach { case (cid, ts) =>
      stampCommit(dest, cid, ts)
    }
    // stats markers stay valid on the clone (the cloned directories
    // are immutable) — carried verbatim so point lookups skip there
    // too. Claims travel because the cloned commits are LANDED on the
    // clone — without them a new writer could "win" an id that already
    // holds data and interleave histories. Base markers ≤ v stay valid
    // (the cloned base is byte-identical) and keep the clone's reads
    // pruned. writeAtomic keeps the no-torn-marker law on the clone.
    def markerId(n: String): Option[Long] =
      Seq(StatsPrefix, ClaimPrefix, BasePrefix, InfoPrefix,
          MappingPrefix)
        .collectFirst { case p if n.startsWith(p) =>
          n.stripPrefix(p).toLong }
    LogFs.list(path)
      .filter(s => s.isFile &&
        markerId(s.getPath.getName).exists(_ <= v))
      .foreach { s =>
        LogFs.writeAtomic(LogFs.child(dest, s.getPath.getName),
          LogFs.readString(s.getPath.toString))
      }
    // the singleton evolution marker travels unconditionally: it has
    // no commit id to bound by, and a false positive on a clone cut
    // below the evolution is a harmless mergeSchema read, while
    // losing it on a clone cut above would silently drop the added
    // columns from a fresh registration of the clone
    if (LogFs.exists(LogFs.child(path, EvolvedMarker)))
      LogFs.writeAtomic(LogFs.child(dest, EvolvedMarker), "v1")
  }

  /** RESTORE the ops table to its state at version `v`, landed as NEW
    * commit `newCommitId` — roll back the data without rolling back
    * the log (Delta's RESTORE): history stays fully readable (every
    * snapshot ≤ the old head is untouched; the restore is one more
    * commit on top), and the commit is the MINIMAL diff between the
    * current head and the target state — an upsert per key whose
    * value changed or vanished after v, a tombstone per key created
    * after v; keys untouched since v contribute NOTHING (the
    * restore's write cost is O(changed keys), not O(table); the diff
    * computation is one full-outer join of the two compacted states,
    * the q88 snapshot-diff shape). Ops-log only by design: restoring
    * past a later insert requires a DELETE, which the plain
    * append-only log cannot express.
    *
    * Both states read through the EVOLVED (mergeSchema) path — like
    * [[checkpointOps]]'s fold, a single-footer read on an evolved log
    * would silently drop later-added columns from the restore commit;
    * restore is rare maintenance, so it pays the footer-merge
    * planning cost the hot snapshot path must not.
    */
  def restoreOps(spark: SparkSession, path: String, keys: Seq[String],
                 v: Long, newCommitId: Long): Unit = {
    requireAboveHorizon(path, v, "restore target version")
    val ids = commitIds(path)
    require(ids.nonEmpty, s"$path has no commits to restore")
    val head = ids.max
    require(v <= head,
      s"restore target $v is beyond the head commit $head of $path")
    require(newCommitId > head,
      s"restore must land as a NEW commit above the head $head of " +
        s"$path, got $newCommitId — commit ids are the version order")
    val target = snapshotAtOpsEvolved(spark, path, keys, v)
    val current = snapshotAtOpsEvolved(spark, path, keys, head)
    // columns DROPPED as of the head never ride the restore commit:
    // the drop contract says new commits omit retired bytes — a
    // restore below the drop that re-materialized the dropped
    // column's values would re-write them into a fresh post-drop
    // commit (invisible to mapped reads, but deferring their
    // physical reclaim past the next fold)
    val droppedNow = mappingAt(path, head)
      .map(_.dropped).getOrElse(Set.empty[String])
    val dataCols = target.columns.filterNot(keys.contains)
      .filterNot(droppedNow.contains).toSeq
    val generated = Set("_in_t", "_in_c") ++
      dataCols.flatMap(c => Seq(s"_t_$c", s"_c_$c"))
    require((keys ++ dataCols).forall(!generated.contains(_)),
      s"column names collide with restore's working columns: " +
        (keys ++ dataCols).filter(generated.contains).mkString(", "))
    val t = target.select(keys.map(col) ++
      dataCols.map(c => col(c).as(s"_t_$c")) :+ lit(true).as("_in_t"): _*)
    val c = current.select(keys.map(col) ++
      dataCols.map(c2 => col(c2).as(s"_c_$c2")) :+ lit(true).as("_in_c"): _*)
    val j = t.join(c, keys, "full_outer")
    val differs = dataCols
      .map(cc => differsNullSafe(col(s"_t_$cc"), col(s"_c_$cc"),
        target.schema(cc).dataType))
      .reduceOption(_ || _).getOrElse(lit(false))
    val ups = j.filter(col("_in_t").isNotNull &&
        (col("_in_c").isNull || differs))
      .select(keys.map(col) ++ dataCols.map(cc => col(s"_t_$cc").as(cc)): _*)
      .withColumn(OpCol, lit("u"))
    val tombstoneShape = target.schema
    val dels = j.filter(col("_in_t").isNull && col("_in_c").isNotNull)
      .select(keys.map(col) ++ dataCols.map(cc =>
        lit(null).cast(tombstoneShape(cc).dataType).as(cc)): _*)
      .withColumn(OpCol, lit("d"))
    commitVerbed(ups.unionByName(dels), path, newCommitId, SoloWriter,
      "restore")
  }

  // ---- Commit statistics: data skipping at the log level ------------
  //
  // A long-lived log accumulates thousands of commits, and a point
  // read through snapshotAt must consider every commit ≤ v because
  // any of them COULD touch the key — at minimum one parquet footer
  // per commit. Per-commit key-range statistics close that gap the
  // way lakehouse file statistics do: an opt-in marker records each
  // commit's [min, max] over one long key column, and the stats-aware
  // point read skips — driver-side, before any footer is opened —
  // every commit whose recorded range excludes the key. Commits
  // WITHOUT a marker are conservatively INCLUDED: stats are an
  // optimization, never the correctness path, so mixed logs stay
  // exact. Markers are sound because commits are immutable once
  // landed (the append-only discipline) and the stats are computed
  // from the commit directory's own final content.

  private val StatsPrefix = "_graft_stats_"

  /** Per-column commit statistics: the null count plus `[min, max]`
    * over the non-null values (absent when the column is all-null in
    * the commit — which soundly SKIPS any non-null value probe).
    * String order is UNSIGNED UTF-8 BYTE order — exactly Spark's
    * min/max (UTF8String) ordering, and the driver-side probes
    * compare the same way, so a skip decision can never disagree with
    * the scan. Null counts make `IS NULL` probes skippable and feed
    * quality audits without a scan.
    */
  sealed trait ColStats { def nulls: Long }
  final case class LongColStats(min: Long, max: Long,
                                nulls: Long) extends ColStats
  final case class StringColStats(min: String, max: String,
                                  nulls: Long) extends ColStats
  final case class AllNullColStats(nulls: Long) extends ColStats

  /** Spark's string min/max order on the driver: unsigned UTF-8 byte
    * compare (UTF8String.compareTo). Java's String.compareTo differs
    * on supplementary characters — using it here could wrong-skip.
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Record commit `commitId`'s per-column statistics over `cols` —
    * min/max/null-count per column, ONE aggregate scan over the
    * commit's own directory however many columns are asked, written
    * atomically as one marker. Long/int and string columns supported
    * (string min/max base64-wrapped in the marker: values may carry
    * tabs/newlines). Re-running recomputes identical values (the
    * commit is immutable), so the overwrite is idempotent.
    */
  def writeCommitStatsMulti(spark: SparkSession, path: String,
                            commitId: Long, rawCols: Seq[String]): Unit = {
    require(rawCols.nonEmpty, "writeCommitStatsMulti needs at least one column")
    val dir = LogFs.child(path, s"$CommitCol=$commitId")
    require(LogFs.isDirectory(dir),
      s"cannot write stats for commit $commitId of $path — no " +
        s"$CommitCol=$commitId directory exists")
    val df = spark.read.parquet(dir)
    val schema = df.schema
    // on a MAPPED log the caller speaks the CURRENT logical namespace
    // (the names `CALL analyze` users see at the SQL prompt); resolve
    // each name to the footer's PHYSICAL spelling — the namespace the
    // marker records and the lookups consult (keys, the only
    // probe-able stats columns, never map, so lookups are unaffected;
    // this makes the RECORDING surface speak both spellings)
    val mapping = currentMapping(path)
      .getOrElse(ColumnMapping(Map.empty, Set.empty))
    val cols = rawCols.map { c =>
      if (schema.fieldNames.contains(c)) c
      else {
        val phys = mapping.physicalOf(c)
        require(schema.fieldNames.contains(phys),
          s"stats column $c not in commit $commitId's schema " +
            s"[${schema.fieldNames.mkString(", ")}]" +
            (if (phys != c) s" (resolved physical name $phys)" else ""))
        phys
      }
    }
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    cols.foreach { c =>
      val dt = schema(c).dataType
      require(dt == LongType || dt == IntegerType || dt == StringType,
        s"stats column $c has type $dt — only long/int/string columns " +
          "have a total order the skipping contract covers")
    }
    val aggs = cols.flatMap { c =>
      val (mn, mx) = schema(c).dataType match {
        case StringType => (min(col(c)), max(col(c)))
        case _ => (min(col(c)).cast("long"), max(col(c)).cast("long"))
      }
      Seq(mn, mx, sum(when(col(c).isNull, 1L).otherwise(0L)))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val lines = cols.zipWithIndex.map { case (c, i) =>
      val (mi, ma, nu) = (i * 3, i * 3 + 1, i * 3 + 2)
      val nulls = if (row.isNullAt(nu)) 0L else row.getLong(nu)
      if (row.isNullAt(mi)) s"$c\tallnull\t$nulls"
      else schema(c).dataType match {
        case StringType =>
          s"$c\tstring\t$nulls\t${b64(row.getString(mi))}\t" +
            b64(row.getString(ma))
        case _ => s"$c\tlong\t$nulls\t${row.getLong(mi)}\t${row.getLong(ma)}"
      }
    }
    LogFs.writeAtomic(LogFs.child(path, s"$StatsPrefix$commitId"),
      ("v2" +: lines).mkString("\n"))
  }

  /** Single-column convenience form of [[writeCommitStatsMulti]]. */
  def writeCommitStats(spark: SparkSession, path: String, commitId: Long,
                       statsCol: String): Unit =
    writeCommitStatsMulti(spark, path, commitId, Seq(statsCol))

  /** All recorded commit statistics: commitId → column → stats. */
  def commitColumnStats(path: String): Map[Long, Map[String, ColStats]] =
    LogFs.list(path)
      .filter(s => s.isFile && s.getPath.getName.startsWith(StatsPrefix))
      .map { s =>
        val lines = LogFs.readString(s.getPath.toString).split("\n").toSeq
        require(lines.headOption.contains("v2"),
          s"unrecognized stats marker format in ${s.getPath} — " +
            s"expected a v2 header, got '${lines.headOption.getOrElse("")}'")
        val byCol = lines.tail.filter(_.nonEmpty).map { ln =>
          val p = ln.split("\t")
          p(1) match {
            case "long" =>
              p(0) -> (LongColStats(p(3).toLong, p(4).toLong,
                p(2).toLong): ColStats)
            case "string" =>
              p(0) -> (StringColStats(unb64(p(3)), unb64(p(4)),
                p(2).toLong): ColStats)
            case "allnull" => p(0) -> (AllNullColStats(p(2).toLong): ColStats)
            case other => throw new IllegalArgumentException(
              s"unrecognized stats kind '$other' in ${s.getPath}")
          }
        }.toMap
        (s.getPath.getName.stripPrefix(StatsPrefix).toLong, byCol)
      }.toMap

  /** The state of the key(s) matching `statsCol == value` AS OF `v`,
    * compacting ONLY the commits whose stats admit the value (plus
    * every unstamped commit, conservatively). At a 10k-commit log
    * where the key was touched in 3 commits, the lookup reads 3
    * commit directories instead of opening 10k footers — the Delta
    * data-skipping story at the commit level. Result is identical to
    * `snapshotAtOps(...).filter(statsCol === value)` (spec-pinned,
    * including through tombstones and resurrections).
    */
  def pointLookupOps(spark: SparkSession, path: String, keys: Seq[String],
                     v: Long, statsCol: String, value: Long): DataFrame =
    rangeLookupOps(spark, path, keys, v, statsCol, value, value)

  /** The state of every key with `statsCol` in `[valueLo, valueHi]`
    * AS OF `v` — the range form of [[pointLookupOps]]: a commit is
    * compacted iff its recorded [min, max] INTERSECTS the probe
    * window (or it carries no stats). The window filter is also
    * pushed into the scan, so within an admitted commit parquet
    * row-group stats prune further — commit skipping and row-group
    * skipping compose.
    */
  def rangeLookupOps(spark: SparkSession, path: String, keys: Seq[String],
                     v: Long, statsCol: String, valueLo: Long,
                     valueHi: Long, mergeSchema: Boolean = false): DataFrame = {
    require(valueLo <= valueHi,
      s"need valueLo <= valueHi, got $valueLo > $valueHi")
    rangeLookupImpl(spark, path, keys, v, statsCol,
      admits = {
        case LongColStats(lo, hi, _) => hi >= valueLo && lo <= valueHi
        case _: AllNullColStats      => false // no non-null values at all
        case _                       => true  // type mismatch: be exact, not clever
      },
      probe = col(statsCol) >= valueLo && col(statsCol) <= valueHi,
      mergeSchema = mergeSchema)
  }

  /** [[pointLookupOps]] for a STRING key column — same skipping
    * contract; the driver's admit decision compares in unsigned UTF-8
    * byte order, exactly the order the recorded min/max were computed
    * in (Spark's UTF8String), so skip and scan can never disagree.
    */
  def pointLookupOpsString(spark: SparkSession, path: String,
                           keys: Seq[String], v: Long, statsCol: String,
                           value: String, mergeSchema: Boolean = false)
      : DataFrame =
    rangeLookupOpsString(spark, path, keys, v, statsCol, value, value,
      mergeSchema)

  /** [[rangeLookupOps]] for a STRING key column. */
  def rangeLookupOpsString(spark: SparkSession, path: String,
                           keys: Seq[String], v: Long, statsCol: String,
                           valueLo: String, valueHi: String,
                           mergeSchema: Boolean = false): DataFrame = {
    require(utf8Compare(valueLo, valueHi) <= 0,
      s"need valueLo <= valueHi (UTF-8 order), got '$valueLo' > '$valueHi'")
    rangeLookupImpl(spark, path, keys, v, statsCol,
      admits = {
        case StringColStats(lo, hi, _) =>
          utf8Compare(hi, valueLo) >= 0 && utf8Compare(lo, valueHi) <= 0
        case _: AllNullColStats => false
        case _                  => true
      },
      probe = col(statsCol) >= valueLo && col(statsCol) <= valueHi,
      mergeSchema = mergeSchema)
  }

  /** One column's contribution to a multi-window lookup: the stats
    * column, its driver-side admit test, and the in-scan probe.
    */
  private[graft] case class LookupWindow(statsCol: String,
                                         admits: ColStats => Boolean,
                                         probe: org.apache.spark.sql.Column)

  /** The INTERSECTION lookup over several constrained key columns —
    * what a composite-key point/range read prunes by: a commit is
    * admitted iff EVERY window's recorded stats admit it (a commit
    * outside any one column's range cannot hold a row satisfying the
    * conjunction), so each additional constrained column can only
    * shrink the opened set. Same conservatism per column as the
    * single-column forms: a missing marker (or a marker lacking the
    * column) admits.
    */
  private[graft] def rangeLookupOpsWindows(spark: SparkSession,
                                           path: String, keys: Seq[String],
                                           v: Long,
                                           windows: Seq[LookupWindow],
                                           mergeSchema: Boolean = false)
      : DataFrame =
    rangeLookupImpl(spark, path, keys, v, windows, mergeSchema)

  /** The [[LookupWindow]] of a long-typed inclusive range. */
  private[graft] def longWindow(statsCol: String, valueLo: Long,
                                valueHi: Long): LookupWindow =
    LookupWindow(statsCol,
      admits = {
        case LongColStats(lo, hi, _) => hi >= valueLo && lo <= valueHi
        case _: AllNullColStats      => false
        case _                       => true
      },
      probe = col(statsCol) >= valueLo && col(statsCol) <= valueHi)

  /** The [[LookupWindow]] of a string-typed inclusive range (UTF-8
    * order — the order the recorded min/max were computed in).
    */
  private[graft] def stringWindow(statsCol: String, valueLo: String,
                                  valueHi: String): LookupWindow =
    LookupWindow(statsCol,
      admits = {
        case StringColStats(lo, hi, _) =>
          utf8Compare(hi, valueLo) >= 0 && utf8Compare(lo, valueHi) <= 0
        case _: AllNullColStats => false
        case _                  => true
      },
      probe = col(statsCol) >= valueLo && col(statsCol) <= valueHi)

  /** Shared lookup kernel: select the commit directories ≤ v (and ≥
    * the base floor) whose recorded stats ADMIT every window — commits
    * without a marker, or whose marker lacks a window's column, are
    * conservatively included — then compact only those under the
    * conjunction of the probes (which also pushes into the scan,
    * composing with parquet row-group skipping).
    */
  private def rangeLookupImpl(spark: SparkSession, path: String,
                              keys: Seq[String], v: Long, statsCol: String,
                              admits: ColStats => Boolean,
                              probe: org.apache.spark.sql.Column,
                              mergeSchema: Boolean): DataFrame =
    rangeLookupImpl(spark, path, keys, v,
      Seq(LookupWindow(statsCol, admits, probe)), mergeSchema)

  private def rangeLookupImpl(spark: SparkSession, path: String,
                              keys: Seq[String], v: Long,
                              windows: Seq[LookupWindow],
                              mergeSchema: Boolean): DataFrame = {
    require(windows.nonEmpty, "range lookup needs at least one window")
    // every stats column must be a KEY column (value constant across a
    // key's versions): with a non-key statsCol, pushing the window
    // predicate BEFORE the LWW compaction would resurrect a stale
    // version whenever the key's latest value moved out of range in a
    // stats-skipped commit, and tombstones (null data columns) would
    // be filtered out, un-deleting keys — silently violating the
    // "identical to snapshotAtOps(...).filter(...)" contract.
    // COLUMN MAPPING never reaches this path: key columns refuse to
    // rename/drop (resolveMappedColumn), so a probe-able stats
    // column's logical and physical spellings coincide by
    // construction — "a renamed stats column" is an unreachable
    // state, closed at the rename verb, not translated here. The
    // RECORDING surface (writeCommitStatsMulti / CALL analyze) does
    // resolve logical spellings for non-key audit columns.
    windows.foreach(w => require(keys.contains(w.statsCol),
      s"statsCol ${w.statsCol} must be one of the key columns " +
        s"[${keys.mkString(", ")}] — a non-key stats column changes " +
        "across a key's versions, making the pre-compaction window " +
        "filter (and the commit skipping) silently wrong"))
    requireAboveHorizon(path, v, "range-lookup version")
    val stats = commitColumnStats(path)
    val floor = baseFloor(path, v)
    val probe = windows.map(_.probe).reduce(_ && _)
    val selected = LogFs.list(path)
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith(s"$CommitCol=") && {
          val id = n.stripPrefix(s"$CommitCol=").toLong
          id <= v && id >= floor && windows.forall(w =>
            stats.get(id).forall(_.get(w.statsCol).forall(w.admits)))
        }
      }
    // mergeSchema folds the ADMITTED commits' footers into their union
    // (an EVOLVED log's lookup must not let one footer's column set
    // silently drop later-added columns); fixed-schema logs keep the
    // single-footer inference
    val ms = mergeSchema.toString
    val log =
      if (selected.isEmpty)
        // nothing admits the window: any commit's schema gives the
        // shape, the false filter gives the empty result without a scan
        requireOpsLog(spark.read.option("mergeSchema", ms).parquet(path),
          path).filter(lit(false))
      else
        requireOpsLog(
          spark.read.option("basePath", path).option("mergeSchema", ms)
            .parquet(selected.map(_.getPath.toString): _*), path)
    Upsert.latestByKey(
      log.filter(col(CommitCol) <= v && probe),
      keys, opsVersion)
      .filter(col(OpCol) === "u")
      .drop(CommitCol, OpCol)
  }

  /** MERGE INTO the ops log — the lakehouse three-clause merge,
    * landed as ONE commit computed from a source frame joined against
    * the current head state:
    *  - WHEN MATCHED AND `deleteWhen` THEN DELETE (tombstone);
    *  - WHEN MATCHED (otherwise) AND any column differs THEN UPDATE
    *    (take the source row); a source row IDENTICAL to the current
    *    state is SUPPRESSED (the no-op hygiene the CDC feed relies
    *    on — and what keeps the commit minimal);
    *  - WHEN NOT MATCHED THEN INSERT — unless `deleteWhen` selects
    *    the row, in which case it is IGNORED (deleting an absent key
    *    is a no-op, the idempotent-delete reading; callers who want
    *    Delta's insert-even-when-delete-matches split their source).
    * `deleteWhen` is evaluated against the SOURCE row's columns. The
    * source must carry exactly the table's columns and be key-unique
    * (two source rows for one key would land two rows in one commit
    * and resolve by the intra-commit tie-break, not by merge
    * semantics). Cost: one key-join of source against the
    * candidate-pruned head compaction; the commit is O(effective
    * changes), never O(table).
    */
  def mergeIntoOps(spark: SparkSession, path: String, keys: Seq[String],
                   source: DataFrame, newCommitId: Long,
                   deleteWhen: Option[org.apache.spark.sql.Column] = None)
      : Unit = {
    val ids = commitIds(path)
    require(ids.nonEmpty, s"$path has no commits to merge into")
    val head = ids.max
    require(newCommitId > head,
      s"merge must land as a NEW commit above the head $head of $path, " +
        s"got $newCommitId — commit ids are the version order")
    val current = snapshotAtOpsEvolved(spark, path, keys, head)
    require(source.columns.toSet == current.columns.toSet,
      s"merge source columns [${source.columns.sorted.mkString(", ")}] " +
        s"must equal the table's [${current.columns.sorted.mkString(", ")}]")
    val dataCols = current.columns.filterNot(keys.contains).toSeq
    val generated = Set("_in_c", "_del") ++ dataCols.map(c => s"_c_$c")
    require((keys ++ dataCols).forall(!generated.contains(_)),
      s"column names collide with merge's working columns: " +
        (keys ++ dataCols).filter(generated.contains).mkString(", "))
    // null-hardened: under three-valued logic a predicate evaluating
    // to NULL (e.g. col > 5 with null col) would fail BOTH the !_del
    // and the (_del && matched) branches — the row silently vanishes
    // from the merge (neither updated/inserted nor deleted). NULL
    // reads as "the delete condition did not hold", i.e. false.
    val s = source.select((keys ++ dataCols).map(col) :+
      coalesce(deleteWhen.getOrElse(lit(false)), lit(false)).as("_del"): _*)
    val c = current.select(keys.map(col) ++
      dataCols.map(cc => col(cc).as(s"_c_$cc")) :+ lit(true).as("_in_c"): _*)
    val j = s.join(c, keys, "left")
    val matched = col("_in_c").isNotNull
    val differs = dataCols
      .map(cc => differsNullSafe(col(cc), col(s"_c_$cc"),
        current.schema(cc).dataType))
      .reduceOption(_ || _).getOrElse(lit(false))
    val ups = j.filter(!col("_del") && (!matched || differs))
      .select((keys ++ dataCols).map(col): _*)
      .withColumn(OpCol, lit("u"))
    val dels = j.filter(col("_del") && matched)
      .select(keys.map(col) ++ dataCols.map(cc =>
        lit(null).cast(current.schema(cc).dataType).as(cc)): _*)
      .withColumn(OpCol, lit("d"))
    commitVerbed(ups.unionByName(dels), path, newCommitId, SoloWriter,
      "merge")
  }

  /** Drop every `_commit=<id>` directory with id strictly below `v` —
    * the vacuum step shared by all checkpoint flavors; callers must
    * have landed the folded base and the horizon first. Also drops
    * two marker classes the fold invalidates: stats markers BELOW v
    * (their commits are gone) and the stats marker AT v — the fold
    * REWROTE `_commit=v` with the full live state, so a pre-fold
    * marker's range no longer bounds the directory's content and a
    * stale one would make [[pointLookupOps]] silently wrong-skip
    * (recompute with [[writeCommitStats]] after the checkpoint if the
    * base should be skippable). Commit STAMPS survive on purpose —
    * the folded base still answers "as of" its instant exactly.
    */
  private def vacuumBelow(path: String, v: Long,
                          statsAtVStale: Boolean = true): Unit = {
    LogFs.list(path)
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith(s"$CommitCol=") &&
          n.stripPrefix(s"$CommitCol=").toLong < v
      }
      .foreach(s => LogFs.delete(s.getPath.toString))
    // the stats marker AT v is stale when the caller REWROTE the
    // directory (a checkpoint's fold — the old ranges no longer bound
    // it; `analyze` re-arms) but still load-bearing when the caller
    // only reclaimed history below an INTACT base (vacuumRetain)
    LogFs.list(path)
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && n.startsWith(StatsPrefix) && {
          val id = n.stripPrefix(StatsPrefix).toLong
          id < v || (statsAtVStale && id == v)
        }
      }
      .foreach(s => LogFs.delete(s.getPath.toString))
    // claim markers below the horizon are stale (their commit dirs are
    // gone and no writer may land below the horizon again); the claim
    // AT v stays — the folded base is still commit v. Base markers
    // below v go with their vacuumed commits; a base AT v stays valid
    // (the fold is itself a complete base).
    LogFs.list(path)
      .filter { s =>
        val n = s.getPath.getName
        s.isFile &&
          ((n.startsWith(ClaimPrefix) &&
            n.stripPrefix(ClaimPrefix).toLong < v) ||
           (n.startsWith(BasePrefix) &&
            n.stripPrefix(BasePrefix).toLong < v) ||
           // info markers go with their vacuumed commits; the marker AT
           // v was re-recorded as 'checkpoint' by the fold, so only
           // strictly-below entries are stale
           (n.startsWith(InfoPrefix) &&
            n.stripPrefix(InfoPrefix).toLong < v))
      }
      .foreach(s => LogFs.delete(s.getPath.toString))
    // sink epoch→commit map markers point at a commit id in their
    // CONTENT; one below the horizon maps a folded commit — a replayed
    // epoch can never legally re-land there (Spark only redelivers the
    // last uncommitted epoch, which is above any sane horizon), so the
    // marker is stale metadata and goes with the claims
    LogFs.list(path)
      .filter { s =>
        s.isFile && s.getPath.getName.startsWith(SinkMapPrefix) &&
          scala.util.Try(LogFs.readString(s.getPath.toString).trim.toLong)
            .toOption.exists(_ < v)
      }
      .foreach(s => LogFs.delete(s.getPath.toString))
  }

  /** Checkpoint the log at commit `v`: fold every commit ≤ v into ONE
    * base commit written as `v` itself, then VACUUM the superseded
    * commit directories — the bounded-history answer the class doc
    * promised ("fold commits ≤ v into a new base commit and drop the
    * olds"). Cost is O(live keys ≤ v) — one snapshot compaction — plus
    * directory deletes; commits > v are never read or touched, so
    * maintenance cost is independent of how much history sits ABOVE
    * the horizon.
    *
    * Contract (the same retention trade every compacting log makes —
    * Kafka compacted topics, lakehouse VACUUM):
    *  - `snapshotAt(w)` for any w ≥ v is byte-identical before and
    *    after (the base holds exactly the pre-checkpoint state at v);
    *  - reads BELOW the horizon (w < v, or a change feed whose v0 < v)
    *    FAIL LOUDLY — the log no longer distinguishes pre-v states, a
    *    silent empty read would be wrong, and a feed would mislabel
    *    every surviving key `insert`; the horizon marker records v so
    *    the guard survives restarts. Pick v to match the time-travel
    *    retention you owe readers.
    *
    * Crash-safety law: the base LANDS before anything is destroyed.
    * The sequence is (1) fold into a staging dir that is a SIBLING of
    * the log — same filesystem, durable across a JVM exit, never the
    * PID-scoped scratch root whose shutdown hook would delete the
    * only copy mid-sequence; (2) dynamic-overwrite the `_commit=v`
    * directory with the fold (so the log is already fully correct:
    * the base's rows carry `_commit=v` and LWW-beat every superseded
    * copy below the horizon); (3) only then vacuum commits STRICTLY
    * below v and drop the staging dir. Every failure point therefore
    * leaves a recoverable log: before (2) completes all source
    * commits are intact (the overwrite swaps at job commit), and
    * after (2) the remaining steps only remove redundancy — re-run
    * `checkpoint(v)` to finish. The staging dir is OUTSIDE the log
    * dir because Spark's file index skips `_`-prefixed dirs even when
    * addressed directly, and any non-`_commit=` child would corrupt
    * partition discovery.
    *
    * The fold reads with `mergeSchema=true`: commits ≤ v may carry
    * evolved schemas ([[snapshotAtEvolved]]), and a single-footer
    * read would silently drop later-added columns from the base —
    * with the vacuum then destroying the only copy. The
    * footer-merge planning cost is the price of deleting data safely;
    * the hot read path ([[snapshotAt]]) still never pays it.
    */
  def checkpoint(spark: SparkSession, path: String, keys: Seq[String],
                 v: Long): Unit =
      withMaintenanceMutex(path, s"checkpoint@$v") {
    requireAboveHorizon(path, v, "checkpoint version")
    val staging = s"${path.stripSuffix("/")}__ckpt_staging_v$v"
    LogFs.delete(staging)
    Upsert.latestByKey(
      requirePlainLog(
        spark.read.option("mergeSchema", "true").parquet(path), path)
        .filter(col(CommitCol) <= v),
      keys, col(CommitCol)).drop(CommitCol)
      .write.mode("overwrite").parquet(staging)
    landFold(spark, staging, path, v)
    writeCommitInfo(path, v, "checkpoint", SoloWriter)
    writeHorizon(path, v)
    vacuumBelow(path, v)
    LogFs.delete(staging)
  }
}
