package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ext.{BloomBits, Bloom, Chunking, RangeJoin, Regression, Resample, Selection, TextHash, TopK}
import graft.functions.Functions.collapseWs

/** Analytics query pack, round 8 widening: the operator families still
  * unexercised after q01–q67 — PIVOT (the inverse of the G1 unpivot,
  * SURVEY.md §2.9), CUBE grouping sets (§2.4), the no-equi-key range
  * join (§2.3, via ext/RangeJoin binning), training-window document
  * chunking (ext/Chunking), and Bloom-filter blocklist membership
  * (ext/Bloom). Every query has a full DuckDB oracle.
  */
object AnalyticsQueries {

  // Fixed operator parameters, shared by the Spark defs and the oracle
  // SQL (same discipline as ExtQueries: the CONFIG is what changes with
  // scale, never the join/aggregation shape).
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val ChunkSize = 200
  private val ChunkStride = 150
  private val IncidentValueMin = 300.0
  private val IncidentWindowMicros: Long = 600L * 1000000L // 10 min
  private val BlockSource = "src0"
  private val BloomNumBits = 8192 // ≥16 bits/key up to ~500 blocklist keys
  private val BloomNumHashes = 5
  private val TopKK = 100 // q130: top-k per event_type
  private val TopKSalts = 8 // q130: phase-1 fan-out per group
  private val HistB = 8 // q163: equi-depth buckets per event_type
  // z-order: 21 bits/dim holds keys to 2M (sf ~100); box selective on
  // BOTH dims — the case neither single-column sort serves
  private val ZBits = 21
  private val ZFiles = 32
  private val ZBoxPartLo = 100; private val ZBoxPartHi = 299
  private val ZBoxSuppLo = 5; private val ZBoxSuppHi = 49
  private val ResampleStepMicros = 6L * 3600L * 1000000L // 6-hour grid
  private val EpochHour2024 = 473352L // 2024-01-01T00Z in epoch hours

  /** Order-independent exact double sum (see RelationalQueries). */
  private def sumd(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast("double")
  private val sqlSumd = (x: String) =>
    s"CAST(sum(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"

  /** q22's exact-dedup content key (normalize → md5) — the blocklist is
    * keyed by content, the realistic decontamination shape.
    */
  private def contentKey(text: Column): Column =
    TextHash.md5Hex(collapseWs(lower(text)))

  /** Bloom bitmap for the blocklist, built once per (dir) per JVM —
    * query construction runs repeatedly (bench warmup + trials, Explain,
    * Verify) and the build is a Spark job (same caching discipline as
    * ExtQueries.embCount). In a release pipeline this is the persisted
    * index artifact built once per blocklist version.
    */
  private val blooms = scala.collection.concurrent.TrieMap[String, BloomBits]()
  private def blocklistBloom(s: SparkSession, d: String): BloomBits =
    blooms.getOrElseUpdate(d, {
      val keys = Tables.documents(s, d)
        .filter(col("source") === BlockSource)
        .select(contentKey(col("text")).as("content_key"))
      Bloom.build(keys, col("content_key"), BloomNumBits, BloomNumHashes)
    })

  /** Z-ordered lineitem layout, staged once per JVM per sf dir (the
    * layout is written once per release and consumed by every slice
    * query — same staging discipline as the bucketed/clustered fixtures
    * in ScaleQueries). q73 times the pruned box scan, not the write.
    */
  private val zStaged = scala.collection.concurrent.TrieMap[String, String]()
  private def stagedZOrderPath(s: SparkSession, d: String): String =
    zStaged.getOrElseUpdate(new java.io.File(d).getCanonicalPath, {
      val p = graft.sources.Sinks.tmpPathFor("zorder_lineitem", d)
      graft.sources.ZOrderLayout.write(Tables.lineitem(s, d),
        "l_partkey", "l_suppkey", ZBits, ZFiles, p)
      p
    })

  /** Bench staging hook (outside the timed window). */
  def stageFixtures(s: SparkSession, d: String): Unit =
    stagedZOrderPath(s, d): Unit

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PIVOT — the wide form the reference's consumers would query the
    // melted fact table back into (§2.9's inverse). Explicit pivot
    // values: no distinct-collect planning job, and the column set is
    // stable as data grows — the 100 TB form of pivot.
    "q68_pivot_events" -> ((s, d) => {
      val piv = Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(sumd(col("value")))
      piv.select(col("user_id") +:
        EventTypes.map(t => col(t).as(s"v_$t")): _*)
    }),

    // UNPIVOT (melt) — q68's true inverse through Spark's NATIVE
    // Dataset.unpivot (the Unpivot logical node, one generated
    // expand — no union of N scans): four lineitem measures to long
    // (key, metric, value) form. At 100 TB this is the
    // wide-telemetry→long-fact normalization step, and the expand
    // multiplies rows INSIDE the scan projection — the corpus is read
    // once.
    "q147_unpivot_melt" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")),

    // Range join without an equi key: all events inside any global
    // incident window [error_ts, error_ts + 10 min) — binned equi-join
    // plan (ext/RangeJoin), never a nested-loop cartesian.
    "q69_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val incidents = ev
        .filter(col("event_type") === "error" && col("value") > IncidentValueMin)
        .select(col("event_id").as("incident_id"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + IncidentWindowMicros).as("hi"))
      val points = ev.select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      RangeJoin.binnedIntervalJoin(points, "ts_us",
          incidents, "lo", "hi", IncidentWindowMicros)
        .select(col("incident_id"), col("event_id"), col("event_type"))
    }),

    // CUBE — all 2^2 grouping sets + grouping() provenance flags (the
    // §2.4 grouping-sets surface beyond q12's rollup). One pass, Spark
    // expands grouping sets before the single exchange.
    "q70_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sumd(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))),

    // ROLLUP — the hierarchical third of the multi-level agg family
    // (q01 flat, q70 cube): sets ((flag,status),(flag),()) — the
    // subtotal/grand-total report shape, one pass, expand-based like
    // cube but |levels|+1 output groups instead of 2^|cols|.
    "q149_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sumd(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))),

    // Overlapping training-window chunking (ext/Chunking law).
    "q71_doc_chunks" -> ((s, d) =>
      Chunking.chunk(Tables.documents(s, d), "doc_id", "text",
        ChunkSize, ChunkStride)),

    // Bloom-prefiltered blocklist membership: map-side bitmap test
    // (zero-exchange on the corpus side), then the exact verify
    // semi-join — result identical to the plain semi-join, which IS the
    // oracle (the Bloom layer must be invisible to correctness).
    "q72_bloom_blocklist" -> ((s, d) => {
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          contentKey(col("text")).as("content_key"))
      val block = keyed.filter(col("source") === BlockSource)
        .select(col("content_key"))
      keyed
        .filter(blocklistBloom(s, d).mightContain(col("content_key")))
        .join(block.distinct(), Seq("content_key"), "left_semi")
        .select(col("doc_id"), col("source"), col("content_key"))
    }),

    // 2-D box slice over the staged Z-ordered layout: both predicates
    // reach the scan (PushedFilters) and the Morton clustering makes
    // file/row-group min-max stats selective on BOTH columns — the
    // multi-dimensional data-skipping path (ZOrderSpec quantifies the
    // file pruning vs a single-column sort).
    "q73_zorder_box" -> ((s, d) =>
      s.read.parquet(stagedZOrderPath(s, d))
        .filter(col("l_partkey").between(ZBoxPartLo, ZBoxPartHi) &&
          col("l_suppkey").between(ZBoxSuppLo, ZBoxSuppHi))),

    // Regular-grid resample + forward fill (ext/Resample): per-user
    // purchase "balance" carried onto a fixed 6-hour grid — the
    // time-series alignment step before feature joins. Latest
    // observation wins within a bucket ((ts, event_id) max); grid spans
    // each user's first..last observed bucket; empty buckets carry the
    // last value forward (copied, never recomputed — cross-engine
    // bit-exact doubles).
    "q111_resample_ffill" -> ((s, d) =>
      Resample.resampleFfill(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        "user_id", "ts", "value", "event_id", ResampleStepMicros)),

    // Interval × interval overlap join (q69's missing half): which user
    // sessions were ACTIVE during which global incident windows —
    // binned equi-join, pair emitted once via the first-shared-bin
    // guard, never a nested loop and never a distinct.
    "q122_overlap_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val sess = graft.ext.Sessions.sessionize(ev, "user_id", "ts", 30)
        .select(col("user_id"), col("sess_seq"),
          unix_micros(col("win_start")).as("s_lo"),
          unix_micros(col("win_end")).as("s_hi"))
      val inc = ev
        .filter(col("event_type") === "error" && col("value") > IncidentValueMin)
        .select(col("event_id").as("incident_id"),
          unix_micros(col("ts")).as("i_lo"),
          (unix_micros(col("ts")) + IncidentWindowMicros).as("i_hi"))
      RangeJoin.binnedOverlapJoin(sess, "s_lo", "s_hi",
          inc, "i_lo", "i_hi", IncidentWindowMicros)
        .select(col("user_id"), col("sess_seq"), col("incident_id"))
    }),

    // Group-wise OLS trend (ext/Regression): value drift per event
    // type over the month, x = hours since 2024-01-01, y = value in
    // ppm — five integer moments in one partial-aggregable pass,
    // sign-corrected integer-ppm slope.
    "q123_group_regression" -> ((s, d) =>
      Regression.groupOls(
        Tables.events(s, d).select(col("event_type"),
          expr(s"unix_micros(ts) div 3600000000L - $EpochHour2024").as("x"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("y")),
        "event_type", "x", "y")),

    // EXACT per-type median (lower) of the ppm-quantized value via
    // iterative histogram selection (ext/Selection) — 3-4 counting
    // scans, zero row movement, vs the sort-everything row_number
    // form the oracle uses (fine at oracle scale, hostile at 100 TB).
    "q125_exact_median" -> ((s, d) =>
      Selection.exactKth(
        Tables.events(s, d).select(col("event_type"),
          expr("CAST(round(value * 1000000) AS BIGINT)").as("v")),
        "event_type", "v", n => (n + 1) / 2)
        .withColumnRenamed("kth", "median_ppm")),

    // Skew-resistant grouped top-k (ext/TopK): top-100 events by value
    // per event_type — 5 groups over the whole table, the exact shape
    // where q07's single window sorts a fifth of 100 TB on one task.
    // Two-phase: local top-k per (type, salt-of-event_id) prunes
    // everything that provably can't be global top-k, then the global
    // rank sorts only salts·k rows per type. Total order (value desc,
    // event_id) makes ranks deterministic; the oracle is the plain
    // one-window form — identical rows by construction.
    "q130_grouped_topk" -> ((s, d) =>
      TopK.groupedTopK(
        Tables.events(s, d).select(col("event_type"), col("event_id"),
          col("value")),
        Seq("event_type"), Seq(col("value").desc, col("event_id").asc),
        k = TopKK, saltFrom = "event_id", salts = TopKSalts)),

    // Equi-depth histogram profile — the data-profiling staple (CBO
    // histograms, drift monitors, binned feature transforms) built on
    // MULTI-quantile exact selection: all 8 per-type boundaries
    // resolve in the SAME ~4 counting scans (Selection.exactKths —
    // not 8 separate selections), zero row movement. Bucketing is
    // then one broadcast sorted-array probe per row (codegen HOF:
    // bucket = 1 + #{boundaries < v}, which provably matches the
    // smallest-covering-interval law even under duplicate boundaries
    // — a zero-width bucket matches no row in both engines) + one
    // partial-aggregable count. Boundary values are data, bucket
    // counts are law: ~n/8 per bucket up to value-tie spill.
    "q163_equidepth_hist" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_type"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v"))
      val ks: Seq[Long => Long] =
        (1 to HistB).map(i => (n: Long) => (i * n + HistB - 1) / HistB)
      val arr = Selection.exactKths(e, "event_type", "v", ks)
        .groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("q"), col("kth"))))
          .as("_s"))
        .select(col("event_type"),
          expr("transform(_s, x -> x.kth)").as("_bnds"))
      e.join(broadcast(arr), "event_type")
        .withColumn("bucket",
          (size(filter(col("_bnds"), b => b < col("v"))) + 1).cast("int"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n_rows"))
        .join(broadcast(arr), "event_type")
        .withColumn("hi_ppm", expr("_bnds[bucket - 1]"))
        .select("event_type", "bucket", "hi_ppm", "n_rows")
    }),

    // Robust outlier screen: per-type median and MAD (median absolute
    // deviation — the robust σ that one fat-finger row cannot drag,
    // unlike mean/stddev), both EXACT via the selection kernel (two
    // ~4-scan selections, zero row movement), then the outlier count
    // at the 3-MAD fence. Everything integer (ppm values, integer
    // fence compare) — no IEEE anywhere, bit-exact cross-engine.
    "q164_mad_outliers" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_type"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("v"))
      val med = Selection.exactKth(e, "event_type", "v", n => (n + 1) / 2)
        .select(col("event_type"), col("kth").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("v") - col("med")))
      val mad = Selection.exactKth(dev, "event_type", "adev",
          n => (n + 1) / 2)
        .select(col("event_type"), col("kth").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max(col("med")).as("median_ppm"),
          max(col("mad")).as("mad_ppm"),
          sum(when(col("adev") > col("mad") * 3, 1L).otherwise(0L))
            .as("n_outliers"))
    }))

  val oracles: Map[String, String] = Map(
    "q68_pivot_events" -> {
      val cols = EventTypes.map(t =>
        s"  ${sqlSumd(s"CASE WHEN event_type = '$t' THEN value END")} AS v_$t")
        .mkString(",\n")
      s"SELECT user_id,\n$cols\nFROM events GROUP BY user_id"
    },

    // the melt law is the 4-way UNION ALL — metric names are Spark's
    // unpivot convention: the source column name verbatim
    "q147_unpivot_melt" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |  l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |FROM lineitem""".stripMargin,

    "q69_range_join" ->
      s"""WITH inc AS (
         |  SELECT event_id AS incident_id, ts AS lo,
         |    ts + INTERVAL 10 MINUTE AS hi
         |  FROM events
         |  WHERE event_type = 'error' AND value > $IncidentValueMin)
         |SELECT i.incident_id, e.event_id, e.event_type
         |FROM events e JOIN inc i ON e.ts >= i.lo AND e.ts < i.hi""".stripMargin,

    "q70_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSumd("l_quantity")} AS sum_qty, count(*) AS n,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q149_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSumd("l_quantity")} AS sum_qty, count(*) AS n,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q71_doc_chunks" ->
      s"""WITH m AS (
         |  SELECT doc_id, text,
         |    CAST((greatest(length(text) - $ChunkSize, 0) + ${ChunkStride - 1})
         |      // $ChunkStride AS INT) + 1 AS n_chunks
         |  FROM documents),
         |x AS (
         |  SELECT doc_id, text, n_chunks,
         |    CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_id
         |  FROM m)
         |SELECT doc_id, chunk_id, n_chunks,
         |  substr(text, chunk_id * $ChunkStride + 1, $ChunkSize) AS chunk_text,
         |  CAST(length(substr(text, chunk_id * $ChunkStride + 1, $ChunkSize))
         |    AS INT) AS chunk_len
         |FROM x""".stripMargin,

    "q72_bloom_blocklist" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, source,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_key
         |  FROM documents)
         |SELECT doc_id, source, content_key FROM keyed
         |WHERE content_key IN
         |  (SELECT content_key FROM keyed WHERE source = '$BlockSource')""".stripMargin,

    // the layout is physical, the content is the plain table: the box
    // slice must return byte-identical rows from either
    "q73_zorder_box" ->
      s"""SELECT * FROM lineitem
         |WHERE l_partkey BETWEEN $ZBoxPartLo AND $ZBoxPartHi
         |  AND l_suppkey BETWEEN $ZBoxSuppLo AND $ZBoxSuppHi""".stripMargin,

    // grid = every bucket between each user's first and last purchase
    // bucket; fill copies the latest (ts, event_id)-max value at or
    // before the bucket — value is never recomputed, so doubles match
    // bit-for-bit
    "q111_resample_ffill" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    value, event_id
         |  FROM events WHERE event_type = 'purchase'),
         |obs AS (
         |  SELECT user_id, us // ${ResampleStepMicros} AS bucket, value,
         |    row_number() OVER (PARTITION BY user_id, us // ${ResampleStepMicros}
         |      ORDER BY us DESC, event_id DESC) AS rn
         |  FROM e),
         |o1 AS (SELECT user_id, bucket, value FROM obs WHERE rn = 1),
         |bounds AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
         |  FROM o1 GROUP BY user_id),
         |grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket
         |  FROM bounds),
         |j AS (SELECT g.user_id, g.bucket, o1.value
         |  FROM grid g LEFT JOIN o1 USING (user_id, bucket))
         |SELECT user_id,
         |  make_timestamp(bucket * ${ResampleStepMicros}) AS bucket_start,
         |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
         |    ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
         |FROM j""".stripMargin,

    // q41's gaps-and-islands sessions as half-open µs intervals,
    // straight inequality overlap against the incident windows (the
    // binning is the ENGINE's plan concern; the law is the overlap)
    "q122_overlap_join" ->
      s"""WITH e AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
         |  FROM events),
         |m AS (
         |  SELECT user_id, ts, us,
         |    CASE WHEN lag(us) OVER w IS NULL
         |              OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, us)),
         |s AS (
         |  SELECT user_id, ts, us,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, us
         |                   ROWS UNBOUNDED PRECEDING) AS sess_seq
         |  FROM m),
         |sess AS (
         |  SELECT user_id, CAST(sess_seq AS INT) AS sess_seq,
         |    min(us) AS s_lo, max(us) + 1800000000 AS s_hi
         |  FROM s GROUP BY user_id, sess_seq),
         |inc AS (
         |  SELECT event_id AS incident_id,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS i_lo,
         |    epoch_us(CAST(ts AS TIMESTAMP)) + $IncidentWindowMicros AS i_hi
         |  FROM events WHERE event_type = 'error' AND value > $IncidentValueMin)
         |SELECT sess.user_id, sess.sess_seq, inc.incident_id
         |FROM sess JOIN inc ON sess.s_lo < inc.i_hi AND inc.i_lo < sess.s_hi""".stripMargin,

    // same integer moments, HUGEINT final arithmetic, sign-corrected
    // // so truncation direction matches Spark's div on negatives
    "q123_group_regression" ->
      s"""WITH e AS (
         |  SELECT event_type,
         |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 - $EpochHour2024 AS x,
         |    CAST(round(value * 1000000) AS BIGINT) AS y
         |  FROM events),
         |a AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM e GROUP BY 1)
         |SELECT event_type, n,
         |  sx * 1000000 // n AS x_mean_ppm,
         |  sy * 1000000 // n AS y_mean_ppm,
         |  CASE
         |    WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
         |      THEN NULL
         |    WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy < 0
         |    THEN -CAST((-(CAST(n AS HUGEINT) * sxy
         |                  - CAST(sx AS HUGEINT) * sy) * 1000000)
         |      // (CAST(n AS HUGEINT) * sxx
         |         - CAST(sx AS HUGEINT) * sx) AS BIGINT)
         |    ELSE CAST(((CAST(n AS HUGEINT) * sxy
         |                - CAST(sx AS HUGEINT) * sy) * 1000000)
         |      // (CAST(n AS HUGEINT) * sxx
         |         - CAST(sx AS HUGEINT) * sx) AS BIGINT)
         |  END AS slope_ppm
         |FROM a""".stripMargin,

    // the law, not the algorithm: k-th smallest value (lower median)
    // per group — the engine reaches it by histogram refinement, the
    // oracle by row_number
    "q125_exact_median" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v
        |  FROM events),
        |r AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e)
        |SELECT event_type, CAST(n AS BIGINT) AS n, v AS median_ppm
        |FROM r WHERE rn = (n + 1) // 2""".stripMargin,

    // boundaries = values at ranks ceil(i·n/B); bucket membership by
    // the smallest-covering-interval law (lag gives each bucket its
    // open lower edge; a zero-width bucket matches no row)
    "q163_equidepth_hist" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v
         |  FROM events),
         |r AS (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM e),
         |idx AS (SELECT i FROM range(1, ${HistB + 1}) t(i)),
         |bnd AS (
         |  SELECT r.event_type, idx.i, r.v AS hi
         |  FROM r JOIN idx ON r.rn = (idx.i * r.n + ${HistB - 1}) // $HistB),
         |bnd2 AS (
         |  SELECT event_type, i, hi,
         |    lag(hi) OVER (PARTITION BY event_type ORDER BY i) AS lo
         |  FROM bnd)
         |SELECT e.event_type, CAST(b.i AS INT) AS bucket, b.hi AS hi_ppm,
         |  CAST(count(*) AS BIGINT) AS n_rows
         |FROM e JOIN bnd2 b
         |  ON e.event_type = b.event_type AND e.v <= b.hi
         |  AND (b.lo IS NULL OR e.v > b.lo)
         |GROUP BY 1, 2, 3""".stripMargin,

    // both medians by the row_number law; the fence compare is pure
    // integers on both sides
    "q164_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v
        |  FROM events),
        |m AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |med AS (SELECT event_type, v AS med FROM m WHERE rn = (n + 1) // 2),
        |dev AS (
        |  SELECT e.event_type, abs(e.v - med.med) AS adev, med.med
        |  FROM e JOIN med USING (event_type)),
        |m2 AS (
        |  SELECT event_type, adev,
        |    row_number() OVER (PARTITION BY event_type ORDER BY adev) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM dev),
        |mad AS (SELECT event_type, adev AS mad FROM m2 WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(d.med) AS median_ppm, max(mad.mad) AS mad_ppm,
        |  CAST(sum(CASE WHEN d.adev > 3 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad USING (event_type)
        |GROUP BY 1""".stripMargin,

    // the plain one-window form — the two-phase plan must produce
    // identical rows and ranks under the same total order
    "q130_grouped_topk" ->
      s"""SELECT event_type, event_id, value, CAST(rank AS INT) AS rank FROM (
         |  SELECT event_type, event_id, value,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY value DESC, event_id) AS rank
         |  FROM events)
         |WHERE rank <= $TopKK""".stripMargin)
}
