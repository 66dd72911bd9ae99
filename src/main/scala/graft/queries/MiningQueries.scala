package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Cohorts, Funnel, Graph, LangModel, Sampling, Scd, Terms}
import graft.sources.{Compaction, Sinks}

/** Mining query pack (round 8, second widening): the index/graph/
  * sequence operator families — inverted-index build (the search-index
  * twin of the q25 posting-list machinery), exact fixed-point PageRank
  * (the source-authority signal web-corpus curation ranks domains by,
  * and the second ITERATIVE graph kernel after connected components),
  * SCD2 history compression (the versioned-dimension build the
  * reference's last-write-wins upsert discards), ordered funnel
  * analysis (multi-step sequence mining), and deterministic fixed-quota
  * group sampling (balanced corpus mixing). Every query has a full
  * DuckDB oracle.
  */
object MiningQueries {

  // Fixed operator parameters shared by the Spark defs and the oracles.
  private val PostingsCap = 20
  private val PrIters = 3
  private val PrDamping = 85
  private val FunnelStages = Seq("signup", "view", "purchase")
  private val GroupK = 5
  private val GroupSalt = "grp_v1"
  private val FragmentFiles = 64
  private val CompactTargetBytes = 4L * 1024 * 1024 // ~4 MiB/file
  // q142: sits just under the co-purchase graph's median degree at
  // sf0.01 (115), where the peel genuinely cascades (1903 → 1878 →
  // 1865 → 1858 → 1857 nodes, stable by round 5 of 8); at smaller sf
  // the whole graph peels away (empty core — both engines agree)
  private val KCoreK = 80
  private val KCoreIters = 8
  private val SeqMaxLen = 50 // q152: per-user sequence cap
  // q158: the co-purchase graph is dense (median degree ~115 at
  // sf0.01), so most of the reachable set sits at 1–2 hops; 4 rounds
  // covers the fringe and proves the per-round law, and extra rounds
  // past frontier exhaustion are no-ops on both engines
  private val BfsDepth = 4

  /** Co-purchase part pairs (u < v): parts sharing an order. Built by
    * per-order POSTING-LIST combination (one groupBy; the
    * prefixCandidates pattern) instead of the lineitem equi-self-join:
    * order line counts are tiny, so the pair expansion is an array
    * combination over a bound column, and the self-join's two full
    * exchanges + sorts of the lineitem table disappear (guide §2.4).
    * Within-order duplicate parts collapse in the collect_set — the
    * consumers (kCore's distinct'd undirected set, BFS's
    * first-discovery frontier, min-source) are multiplicity-blind.
    */
  private def coPurchasePairs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) > 1)
      .select(explode(flatten(transform(col("ps"), (a, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          b => struct(a.as("u"), b.as("v")))))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))

  /** Fragmented orders copy (the small-file problem as a fixture),
    * staged once per JVM per sf dir — q84 times the COMPACTION, never
    * the fixture build. Content is exactly Tables.orders.
    */
  private val fragmented = scala.collection.concurrent.TrieMap[String, String]()
  private def fragmentedOrdersPath(s: SparkSession, d: String): String =
    fragmented.getOrElseUpdate(new java.io.File(d).getCanonicalPath, {
      val p = Sinks.tmpPathFor("frag_orders", d)
      Tables.orders(s, d).repartition(FragmentFiles)
        .write.mode("overwrite").parquet(p)
      p
    })

  /** Bench staging hook (outside the timed window). */
  def stageFixtures(s: SparkSession, d: String): Unit =
    fragmentedOrdersPath(s, d): Unit

  /** Bipartite supply graph: supplier ↔ part, both directions, over
    * disjoint long node ids (supplier 2k, part 2k+1). The realistic
    * "rank entities by link authority" input derivable from the
    * relational side of the testdata.
    */
  private def supplyEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_suppkey"), col("l_partkey"))
    li.select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .union(li.select((col("l_partkey") * 2 + 1).as("src"),
        (col("l_suppkey") * 2).as("dst")))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Inverted index: term -> exact df + bounded posting list. The rank
    // cut and the aggregate share one exchange on `term`; collect state
    // is bounded by the cap BEFORE aggregation (see Terms.invertedIndex).
    // The REGISTERED verify form flattens the posting-list array to a
    // space-joined string (the q43 array-primary/flat-verify pattern):
    // the driver's pandas comparator cannot hash array-typed cells, so
    // registered outputs must be scalar-typed. The array API stays on
    // Terms.invertedIndex for programmatic consumers.
    "q76_inverted_index" -> ((s, d) =>
      Terms.invertedIndex(Tables.documents(s, d), "doc_id", "text",
        PostingsCap)
        .withColumn("postings",
          array_join(col("postings").cast("array<string>"), " "))),

    // PageRank, exact integer ppm arithmetic, fixed 3 iterations.
    "q77_pagerank" -> ((s, d) =>
      Graph.pageRankPpm(supplyEdges(s, d), PrIters, PrDamping)),

    // k-core peel over the part co-purchase graph (parts sharing an
    // order): the density filter — nodes surviving repeated
    // remove-degree-<k rounds, with their within-core degree. Fixed
    // 8-round unroll shared with the oracle; peeling is monotone so
    // extra rounds after the fixpoint are no-ops.
    "q142_kcore" -> ((s, d) =>
      Graph.kCore(coPurchasePairs(s, d), KCoreK, KCoreIters)),

    // Single-source BFS levels over the same co-purchase graph: hop
    // distance from the smallest part key (a deterministic source both
    // engines derive identically). The frontier-expansion kernel —
    // equi-join per round, first-discovery-wins anti-join — is the
    // graph family's navigation primitive; the bounded collect is ONE
    // row (the source id).
    "q158_bfs_levels" -> ((s, d) => {
      // materialize the pair build ONCE: the source-id aggregate and
      // the BFS itself previously each re-ran the whole construction
      val pairs = coPurchasePairs(s, d).localCheckpoint()
      val source = pairs.agg(min(col("u"))).head().getLong(0)
      Graph.bfsLevels(pairs, source, BfsDepth)
    }),

    // SCD2 run compression of the per-user event-type history.
    "q78_scd2_versions" -> ((s, d) =>
      Scd.compressHistory(Tables.events(s, d), "user_id", "ts",
        "event_id", "event_type")),

    // Daily snapshot reconstruction FROM the SCD2 dimension — the
    // warehouse op q78's versioned build exists to serve: for every
    // (user, day-end) instant, the version whose validity interval
    // covers it. The interval law makes the lookup exact and
    // tie-proof: versions partition each user's timeline from their
    // first event onward, and a zero-length run (two versions sharing
    // effective_from, possible under same-µs events) matches NO
    // instant — so the join is provably 1:≤1 with no as-of tie-break
    // needed. Plan: the day grid is distinct-users × a 30-row
    // broadcast day list (derived from a 1-row min/max aggregate);
    // the lookup is an equi-join on user_id (SMJ/shuffle-hash on the
    // key) with the interval predicate as a post-join filter —
    // per-user version counts bound the filter's fan-in, never the
    // table. LEFT join keeps pre-first-event user-days as explicit
    // null snapshots (the dashboard's "not yet seen" rows).
    "q161_scd2_snapshot" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val scd = Scd.compressHistory(ev, "user_id", "ts",
        "event_id", "event_type")
      val bounds = ev.agg(
        to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
      val days = broadcast(bounds.select(
        explode(sequence(col("d0"), col("d1"))).as("day")))
      val probe = ev.select(col("user_id")).distinct()
        .crossJoin(days)
        .withColumn("snap",
          col("day").cast("timestamp") + expr("INTERVAL 1 DAY")
            - expr("INTERVAL 1 MICROSECOND"))
      probe.join(scd,
          probe("user_id") === scd("user_id") &&
            scd("effective_from") <= probe("snap") &&
            (scd("effective_to").isNull ||
              scd("effective_to") > probe("snap")),
          "left")
        .select(probe("user_id"), probe("day"),
          scd("value").as("cur_value"), scd("version").as("cur_version"))
    }),

    // Point-in-time feature join (leakage-free training features):
    // for every purchase (label event), the user's click count
    // STRICTLY BEFORE that purchase under the (ts, event_id) total
    // order — the as-of-label-time aggregate that prevents
    // training-serving skew (a plain groupBy feature would leak
    // post-label clicks into the example). One window pass over the
    // unioned event stream (rows UNBOUNDED PRECEDING → -1 excludes
    // the label row itself); no self-join, no per-label scan.
    "q153_pit_features" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("clicks_before",
          coalesce(sum(when(col("event_type") === "click", 1L)
            .otherwise(0L)).over(w), lit(0L)))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("clicks_before"))
    }),

    // Per-key ordered sequence extraction — the behavioral-LM training
    // example: each user's first-K event types in exact (ts, event_id)
    // order as one space-joined string. The rank filter runs BEFORE
    // the collect, so per-key state is bounded by K — a bare
    // collect_list would be unbounded by the hottest key — and
    // array_sort on the (rn, type) structs pins the order
    // collect_list itself does not guarantee.
    "q152_event_sequences" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= SeqMaxLen)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("seq_len"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type")), " ").as("seq"))
    }),

    // Ordered conversion funnel: earliest strictly-increasing
    // signup -> view -> purchase timestamps per user.
    "q80_funnel" -> ((s, d) =>
      Funnel.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
        FunnelStages)),

    // Deterministic fixed-quota per-source sample.
    "q81_group_sample" -> ((s, d) =>
      Sampling.groupSample(Tables.documents(s, d), "source", "doc_id",
        GroupK, GroupSalt)
        .select(col("doc_id"), col("source"), col("sample_rank"))),

    // Model-based quality scoring: corpus char-trigram LM, fixed-point
    // per-gram log-probs, one float division per document.
    "q82_trigram_lm_score" -> ((s, d) =>
      LangModel.scoreByTrigramLm(Tables.documents(s, d), "doc_id", "text")),

    // Cohort retention matrix over the event log.
    "q83_cohort_retention" -> ((s, d) =>
      Cohorts.retention(Tables.events(s, d), "user_id", "ts")),

    // Recursive-CTE hierarchy walk — the SQL surface a warehouse user
    // reaches for on tree/DAG data (org charts, category trees, thread
    // ancestry): per-node depth over the deterministic binary-tree law
    // parent(i) = (i−1) div 2 on the contiguous doc_id universe, via
    // Spark 4's native WITH RECURSIVE (UnionLoop operator). UNION ALL
    // recursion is path-counting, so the engine contract is documented
    // here: it is the right tool when paths are UNIQUE (hierarchies —
    // rows = nodes, iterations = depth = O(log n), each step one
    // frontier join); for cyclic/dense graphs where path counts
    // explode, use the dedicated kernels (Graph.connectedComponents,
    // pageRankPpm) — Spark rejects deduplicating UNION recursion
    // (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE, probed).
    "q103_recursive_hierarchy" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"))
        .createOrReplaceTempView("graft_tree_nodes")
      s.sql(
        """WITH RECURSIVE lvl(id, depth) AS (
          |  SELECT CAST(0 AS BIGINT) AS id, 0 AS depth
          |  UNION ALL
          |  SELECT n.doc_id AS id, l.depth + 1 AS depth
          |  FROM lvl l JOIN graft_tree_nodes n
          |    ON (n.doc_id - 1) DIV 2 = l.id AND n.doc_id > 0
          |  WHERE l.depth < 64)
          |SELECT id, CAST(depth AS INT) AS depth FROM lvl""".stripMargin)
    }),

    // Small-file compaction: rewrite the staged 64-fragment orders copy
    // at ~target bytes/file (the timed operator IS the compaction; the
    // layout is physical, so the oracle is the plain table).
    "q84_compaction" -> ((s, d) => {
      val in = fragmentedOrdersPath(s, d)
      val out = Sinks.tmpPathFor("compact_orders", d)
      Compaction.compact(s, in, out, CompactTargetBytes)
      Compaction.read(s, out)
    }))

  val oracles: Map[String, String] = Map(

    // identical recursion in DuckDB (// is the BIGINT floor division
    // twin of Spark's DIV on non-negative ids)
    "q103_recursive_hierarchy" ->
      """WITH RECURSIVE lvl(id, depth) AS (
        |  SELECT CAST(0 AS BIGINT), 0
        |  UNION ALL
        |  SELECT n.doc_id, l.depth + 1
        |  FROM lvl l JOIN documents n
        |    ON (n.doc_id - 1) // 2 = l.id AND n.doc_id > 0
        |  WHERE l.depth < 64)
        |SELECT id, CAST(depth AS INT) AS depth FROM lvl""".stripMargin,

    "q76_inverted_index" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM documents),
         |pairs AS (
         |  SELECT DISTINCT doc_id, term FROM t WHERE length(term) > 0),
         |r AS (
         |  SELECT term, doc_id,
         |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
         |  FROM pairs)
         |SELECT term, CAST(count(*) AS BIGINT) AS df,
         |  string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY doc_id)
         |    FILTER (WHERE rn <= $PostingsCap) AS postings,
         |  count(*) > $PostingsCap AS truncated
         |FROM r GROUP BY term""".stripMargin,

    // Unrolled fixed-point iteration: every quantity is BIGINT and
    // every step is integer arithmetic, so the engines must agree
    // bit-for-bit (// and `div` both floor on non-negative values).
    "q77_pagerank" -> {
      val iterCte = (k: Int) =>
        s"""r$k AS (
           |  SELECT n.id,
           |    CAST(150000 + ($PrDamping * COALESCE(s.m, 0)) // 100 AS BIGINT)
           |      AS rank_ppm
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS id, sum(r.rank_ppm // deg.outdeg) AS m
           |    FROM r${k - 1} r
           |    JOIN deg ON r.id = deg.src
           |    JOIN e ON e.src = deg.src
           |    GROUP BY e.dst) s ON n.id = s.id)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
         |  FROM lineitem
         |  UNION
         |  SELECT DISTINCT l_partkey * 2 + 1, l_suppkey * 2 FROM lineitem),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
         |        FROM e GROUP BY src),
         |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_ppm FROM n),
         |${(1 to PrIters).map(iterCte).mkString(",\n")}
         |SELECT id, rank_ppm FROM r$PrIters""".stripMargin
    },

    // unrolled peel (the q77 discipline): per round, the keep set is
    // the HAVING-degree filter and the edge set is restricted to
    // kept×kept; symmetric edges ⇒ degree = row count per u
    "q142_kcore" -> {
      val rounds = (1 to KCoreIters).map { i =>
        val prev = s"s${i - 1}"
        s"""k$i AS (SELECT u AS id FROM $prev GROUP BY u
           |  HAVING count(*) >= $KCoreK),
           |s$i AS MATERIALIZED (
           |  SELECT e.u, e.v FROM $prev e
           |  JOIN k$i a ON e.u = a.id JOIN k$i b ON e.v = b.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH pp AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |s0 AS MATERIALIZED (SELECT u, v FROM pp UNION SELECT v, u FROM pp),
         |$rounds
         |SELECT u AS id, CAST(count(*) AS BIGINT) AS deg
         |FROM s$KCoreIters GROUP BY u""".stripMargin
    },

    // frontier unroll (the q142 discipline): per round, the new
    // frontier is the neighbors of the previous one minus every node
    // already leveled — first discovery wins, which IS hop distance
    "q158_bfs_levels" -> {
      val rounds = (1 to BfsDepth).map { i =>
        s"""f$i AS MATERIALIZED (
           |  SELECT DISTINCT e.v AS id FROM s0 e
           |  JOIN f${i - 1} p ON e.u = p.id
           |  WHERE e.v NOT IN (SELECT id FROM v${i - 1})),
           |v$i AS (SELECT id, lvl FROM v${i - 1}
           |  UNION ALL SELECT id, $i AS lvl FROM f$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH pp AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |s0 AS MATERIALIZED (SELECT u, v FROM pp UNION SELECT v, u FROM pp),
         |v0 AS (SELECT (SELECT min(u) FROM s0) AS id, 0 AS lvl),
         |f0 AS (SELECT id FROM v0),
         |$rounds
         |SELECT id, CAST(lvl AS INT) AS lvl FROM v$BfsDepth""".stripMargin
    },

    // the same strictly-before law as an explicit window frame; the
    // (ts, event_id) total order pins same-timestamp semantics
    "q153_pit_features" ->
      """SELECT event_id, user_id, ts, clicks_before FROM (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_type,
        |    CAST(COALESCE(
        |      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS clicks_before
        |  FROM events)
        |WHERE event_type = 'purchase'""".stripMargin,

    // identical rank-filter-then-aggregate law; string_agg's ORDER BY
    // is the oracle form of the engine's array_sort-pinned collect
    "q152_event_sequences" ->
      s"""WITH r AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM events)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS seq_len,
         |  string_agg(event_type, ' ' ORDER BY rn) AS seq
         |FROM r WHERE rn <= $SeqMaxLen GROUP BY user_id""".stripMargin,

    "q78_scd2_versions" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN row_number() OVER w = 1 THEN 1
        |         WHEN event_type IS NOT DISTINCT FROM lag(event_type) OVER w
        |           THEN 0
        |         ELSE 1 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (
        |  SELECT user_id, ts, event_type,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS INT) AS version
        |  FROM m),
        |g AS (
        |  SELECT user_id, version, min(event_type) AS value,
        |    min(ts) AS effective_from, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM v GROUP BY user_id, version)
        |SELECT user_id, version, value, effective_from, n_rows,
        |  lead(effective_from) OVER w2 AS effective_to,
        |  lead(effective_from) OVER w2 IS NULL AS is_current
        |FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY version)""".stripMargin,

    // same gaps-and-islands versions CTE as q78, then the interval
    // lookup per (user, end-of-day) instant; zero-length runs match
    // no instant, so the join is 1:≤1 by construction
    "q161_scd2_snapshot" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN row_number() OVER w = 1 THEN 1
        |         WHEN event_type IS NOT DISTINCT FROM lag(event_type) OVER w
        |           THEN 0
        |         ELSE 1 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (
        |  SELECT user_id, ts, event_type,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS INT) AS version
        |  FROM m),
        |g AS (
        |  SELECT user_id, version, min(event_type) AS value,
        |    min(ts) AS effective_from
        |  FROM v GROUP BY user_id, version),
        |scd AS (
        |  SELECT user_id, version, value, effective_from,
        |    lead(effective_from) OVER (PARTITION BY user_id
        |      ORDER BY version) AS effective_to
        |  FROM g),
        |b AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        |      FROM e),
        |days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |probe AS (
        |  SELECT u.user_id, days.day,
        |    CAST(days.day AS TIMESTAMP) + INTERVAL 1 DAY
        |      - INTERVAL 1 MICROSECOND AS snap
        |  FROM (SELECT DISTINCT user_id FROM e) u, days)
        |SELECT p.user_id, p.day, s.value AS cur_value,
        |  s.version AS cur_version
        |FROM probe p LEFT JOIN scd s
        |  ON s.user_id = p.user_id AND s.effective_from <= p.snap
        |  AND (s.effective_to IS NULL OR s.effective_to > p.snap)""".stripMargin,

    "q80_funnel" -> {
      val Seq(s0, s1, s2) = FunnelStages
      s"""WITH e AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
         |  FROM events),
         |a AS (
         |  SELECT *, min(CASE WHEN event_type = '$s0' THEN ts END)
         |    OVER (PARTITION BY user_id) AS t0 FROM e),
         |b AS (
         |  SELECT *, min(CASE WHEN event_type = '$s1' AND ts > t0 THEN ts END)
         |    OVER (PARTITION BY user_id) AS t1 FROM a),
         |c AS (
         |  SELECT *, min(CASE WHEN event_type = '$s2' AND ts > t1 THEN ts END)
         |    OVER (PARTITION BY user_id) AS t2 FROM b)
         |SELECT user_id, max(t0) AS ts_$s0, max(t1) AS ts_$s1,
         |  max(t2) AS ts_$s2,
         |  CAST(CASE WHEN max(t0) IS NOT NULL THEN 1 ELSE 0 END
         |     + CASE WHEN max(t1) IS NOT NULL THEN 1 ELSE 0 END
         |     + CASE WHEN max(t2) IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |    AS stages_reached
         |FROM c GROUP BY user_id""".stripMargin
    },

    "q81_group_sample" ->
      s"""WITH r AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY md5('$GroupSalt' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS rn
         |  FROM documents)
         |SELECT doc_id, source, CAST(rn AS INT) AS sample_rank
         |FROM r WHERE rn <= $GroupK""".stripMargin,

    // fixed-point lp_ppm = round(ln(cnt/total)·10⁶) — the q61 idf
    // contract; the only float op per document is ONE division of two
    // exact longs, identical IEEE on both engines
    "q82_trigram_lm_score" ->
      """WITH tg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, length(text) - 1),
        |    i -> substr(text, i, 3))) AS g
        |  FROM documents WHERE length(text) >= 3),
        |model AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS cnt FROM tg GROUP BY g),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tg),
        |lp AS (
        |  SELECT g, CAST(round(ln(CAST(cnt AS DOUBLE) / (SELECT n FROM tot))
        |    * 1000000) AS BIGINT) AS lp_ppm
        |  FROM model)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |  CAST(sum(l.lp_ppm) AS BIGINT) AS sum_lp_ppm,
        |  CAST(sum(l.lp_ppm) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS avg_logprob
        |FROM tg t JOIN lp l ON t.g = l.g
        |GROUP BY t.doc_id""".stripMargin,

    // Monday-based date_trunc('week') on both engines; day diffs are
    // exact multiples of 7
    "q83_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM e GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
        |  FROM e),
        |j AS (
        |  SELECT a.user_id, f.cohort_week,
        |    CAST(date_diff('day', CAST(f.cohort_week AS DATE),
        |      CAST(a.activity_week AS DATE)) // 7 AS INT) AS week_offset
        |  FROM a JOIN f USING (user_id))
        |SELECT cohort_week, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY cohort_week, week_offset""".stripMargin,

    // compaction is physical layout only — content must equal the table
    "q84_compaction" -> "SELECT * FROM orders")
}
