package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ext.{Funnel, Graph, Sampling, Scd, Terms}

/** Unit tests for the mining operators (q76–q81 families): inverted
  * index (exact df + bounded postings + one-exchange plan), fixed-point
  * PageRank (vs an independent driver-side recompute of the same
  * integer law), SCD2 run compression (runs, ties, open tail), ordered
  * funnel (strictly-after semantics), and fixed-quota group sampling
  * (exact quotas, determinism, partitioning independence).
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // ---- Terms.invertedIndex ------------------------------------------

  test("invertedIndex: exact df, bounded sorted postings, truncation flag") {
    val docs = Seq(
      (1L, "apple banana apple"), // dup token inside one doc → one posting
      (2L, "banana cherry"),
      (3L, "apple  banana"),      // double space → no empty term
      (4L, "date")
    ).toDF("doc_id", "text")
    val out = Terms.invertedIndex(docs, "doc_id", "text", 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getSeq[Long](2).toList, r.getBoolean(3)))).toMap
    assert(out("apple") == ((2L, List(1L, 3L), false)))
    assert(out("banana") == ((3L, List(1L, 2L), true))) // capped at 2
    assert(out("cherry") == ((1L, List(2L), false)))
    assert(out("date") == ((1L, List(4L), false)))
    assert(out.size == 4)
  }

  test("invertedIndex: rank cut + aggregate share ONE exchange on term") {
    val docs = (0L until 100L)
      .map(i => (i, s"common tok$i ${if (i % 2 == 0) "even" else "odd"}"))
      .toDF("doc_id", "text")
    val out = Terms.invertedIndex(docs, "doc_id", "text", 5)
    out.collect()
    val plan = out.queryExecution.executedPlan
    val finalPlan = plan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(plan)
    // distinct(doc,term) = 1 exchange; window+groupBy on term = 1 more.
    // A third exchange means the window and the aggregate stopped
    // sharing their term-partitioning.
    val exchanges = finalPlan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 2,
      s"expected ≤2 exchanges (pair-distinct, term), got " +
        s"${exchanges.size}:\n$finalPlan")
  }

  // ---- Graph.pageRankPpm --------------------------------------------

  /** Driver-side recompute of the exact integer law, independent code. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          damping: Int): Map[Long, Long] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val teleport = (100L - damping) * 10000L
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val heard = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(n =>
        n -> (teleport + damping * heard.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("pageRankPpm matches an independent exact-integer recompute") {
    // hub-and-spoke plus a chain and a dangling node (5 has no out-edge)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L),
      (1L, 5L), (2L, 5L), (1L, 2L) /* parallel dup */)
    for (iters <- Seq(0, 1, 3)) {
      val got = Graph.pageRankPpm(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPageRank(edges, iters, 85), s"iters=$iters")
    }
  }

  test("pageRankPpm: authority ordering is sensible on a star") {
    // everyone links to 9; 9 links back to 0 only
    val edges = ((0L until 9L).map(i => (i, 9L)) :+ (9L, 0L)).toDF("src", "dst")
    val r = Graph.pageRankPpm(edges, 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(9L) > r(0L), "hub must outrank its single target")
    assert(r(0L) > r(1L), "9's target must outrank a plain spoke")
    assert((1L until 9L).map(r).toSet.size == 1, "spokes tie exactly")
  }

  // ---- Scd.compressHistory ------------------------------------------

  test("compressHistory: runs, timestamp ties, null values, open tail") {
    val log = Seq(
      // user 1: A A B A — 3 versions; tie at ts=20 broken by event_id
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 20L, 3L, "B"),
      (1L, 30L, 4L, "A"),
      // user 2: null → null → X — null run compresses, null→X is a change
      (2L, 10L, 5L, null), (2L, 20L, 6L, null), (2L, 30L, 7L, "X")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Scd.compressHistory(log, "user_id", "ts", "event_id",
        "event_type")
      .select("user_id", "version", "value", "effective_from",
        "effective_to", "n_rows", "is_current")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toSet
    assert(got == Set(
      (1L, 1, "A", 10L, 20L, 2L, false),
      (1L, 2, "B", 20L, 30L, 1L, false),
      (1L, 3, "A", 30L, -1L, 1L, true),
      (2L, 1, null, 10L, 30L, 2L, false),
      (2L, 2, "X", 30L, -1L, 1L, true)))
  }

  // ---- Funnel.funnel ------------------------------------------------

  test("funnel: strictly-after stage ordering; partial and empty funnels") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE signup — stage 3 not reached
      (2L, 10L, "purchase"), (2L, 20L, "signup"), (2L, 30L, "view"),
      // user 3: view at the SAME ts as signup — strict > rejects it
      (3L, 10L, "signup"), (3L, 10L, "view"),
      // user 4: never signed up
      (4L, 10L, "view"), (4L, 20L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getInt(4)))).toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
    assert(got(2L) == ((Some(20L), Some(30L), None, 2)))
    assert(got(3L) == ((Some(10L), None, None, 1)))
    assert(got(4L) == ((None, None, None, 0)))
  }

  // ---- Sampling.groupSample -----------------------------------------

  test("groupSample: exact quotas, deterministic, partitioning-independent") {
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
      .union(Seq((1000L, "tiny")).toDF("id", "grp")) // |group| < k
    val a = Sampling.groupSample(df, "grp", "id", 7, "s1")
      .select("grp", "id").as[(String, Long)].collect().toSet
    val b = Sampling.groupSample(df.repartition(13), "grp", "id", 7, "s1")
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(a == b, "sample must not depend on physical partitioning")
    val sizes = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes == Map("g0" -> 7, "g1" -> 7, "g2" -> 7, "tiny" -> 1))
    // different salt → different (deterministic) choice, same quotas
    val c = Sampling.groupSample(df, "grp", "id", 7, "s2")
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(c != a, "salt must steer the selection")
  }

  // ---- recursive CTE (q103 engine contract) --------------------------

  test("kCore: cascade peel, within-core degrees, empty core, idempotence") {
    import spark.implicits._
    // K4 clique {1,2,3,4} + a tail 4-5-6: node 5 has degree 2 only
    // AFTER 6 peels (cascade), and the clique's degrees drop from
    // {3,3,3,4} to exactly 3 once the tail is gone
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")
    def run(k: Int, iters: Int) =
      Graph.kCore(edges, k, iters).as[(Long, Long)].collect().toMap
    // k=2: 6 peels (deg 1), then 5 peels (deg 1 after the cascade) —
    // two rounds genuinely needed; the clique+4 remains
    assert(run(2, 4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // after one round only 6 is gone: 5 still present at deg 1
    assert(run(2, 1) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L))
    // k=3: the clique is the 3-core
    assert(run(3, 4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=4: nothing survives (no K5)
    assert(run(4, 4) == Map.empty)
    // extra rounds past the fixpoint are no-ops
    assert(run(2, 8) == run(2, 4))
  }

  test("bfsLevels: hop distances, first-discovery-wins, frontier exhaustion") {
    import spark.implicits._
    // path 1-2-3-4 with a shortcut 1-3 (3 is discovered at hop 1, the
    // 2-hop path via 2 must NOT relabel it), plus an unreachable
    // component {8,9}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (8L, 9L)).toDF("a", "b")
    def run(depth: Int) =
      Graph.bfsLevels(edges, 1L, depth).as[(Long, Int)].collect().toMap
    assert(run(3) == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // depth caps the sweep: at 1 the fringe is unlabeled
    assert(run(1) == Map(1L -> 0, 2L -> 1, 3L -> 1))
    // rounds past frontier exhaustion are no-ops (and short-circuit)
    assert(run(10) == run(3))
    // unreachable nodes never appear
    assert(!run(10).contains(8L) && !run(10).contains(9L))
  }

  test("recursive CTE: hierarchy depths exact on a 7-node binary tree") {
    (0L until 7L).toDF("doc_id").createOrReplaceTempView("rec_spec_nodes")
    val got = spark.sql(
      """WITH RECURSIVE lvl(id, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, 0 AS depth
        |  UNION ALL
        |  SELECT n.doc_id AS id, l.depth + 1 AS depth
        |  FROM lvl l JOIN rec_spec_nodes n
        |    ON (n.doc_id - 1) DIV 2 = l.id AND n.doc_id > 0
        |  WHERE l.depth < 64)
        |SELECT id, depth FROM lvl""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 1,
      3L -> 2, 4L -> 2, 5L -> 2, 6L -> 2))
    assert(got.size == 7, "unique paths => exactly one row per node")
  }

  test("recursive CTE: deduplicating UNION is rejected by the engine") {
    // the documented q103 contract: UNION ALL recursion only — path
    // counts explode on cyclic graphs, so those use the Graph kernels
    (0L until 2L).toDF("doc_id").createOrReplaceTempView("rec_spec_nodes2")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """WITH RECURSIVE r(id) AS (
          |  SELECT CAST(0 AS BIGINT)
          |  UNION
          |  SELECT doc_id FROM rec_spec_nodes2 JOIN r ON doc_id = id + 1)
          |SELECT * FROM r""".stripMargin).collect()
    }
    assert(e.getCondition == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE")
  }
}
