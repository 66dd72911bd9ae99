package graft.ext

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step a near-dedup pipeline needs AFTER pair generation: LSH/Jaccard/
  * SimHash emit PAIRS, but keep-one-per-duplicate-group semantics need
  * the transitive closure (A~B, B~C ⇒ {A,B,C} is one group even when
  * A~C was never emitted). Every member gets its component's minimum id
  * as `cluster_id` — the canonical survivor choice.
  *
  * Two kernels, composed:
  *
  * 1. Min-label propagation (the Pregel/GraphX CC kernel) — the FAST
  *    PATH. Each round is one equi-join (edge ⋈ label) + one min
  *    aggregate, both map-side combinable, shuffling only on node id.
  *    Rounds needed = graph diameter; near-duplicate components are
  *    quasi-cliques from band-bucket collisions, so diameter stays in
  *    the low single digits no matter the corpus size. The per-round
  *    convergence check is an `observe` metric (a CollectMetrics node
  *    computed INSIDE the job that materializes the round's labels) —
  *    one action per round, no separate probe join. Labels are
  *    localCheckpoint'ed per round so lineage stays O(1).
  *
  * 2. Large-star/small-star (Kiveris et al., "Connected Components in
  *    MapReduce and Beyond", SoCC '14) — the GENERAL-TOPOLOGY PATH,
  *    O(log² n) rounds on ANY graph including the adversarial long
  *    chain. Costlier per round (each star op is a groupBy + a join +
  *    a distinct), so it is not the default; propagation FALLS BACK to
  *    it automatically if the diameter exceeds `maxIter` — non-
  *    convergence is never surfaced as wrong labels OR as an error,
  *    it just switches algorithm.
  *
  * No data ever collects to the driver in either kernel.
  */
object Graph {

  /** Components RESTRICTED TO the nodes of `universe`: every universe
    * node is emitted exactly once — edge-incident ones with their
    * component label, isolated ones as singletons (`cluster_id = id`),
    * which is the release semantics of keep-one-per-duplicate-group
    * over a full corpus (a document with no near-dup pair is its own
    * survivor). One extra left join on the node id; the universe side
    * is never iterated.
    *
    * CONTRACT: edges must reference only universe members. An
    * edge-incident node ABSENT from the universe is not emitted (the
    * join is a restriction, not a union), and — since labels are
    * component-minimum ids — a surviving member's `cluster_id` could
    * then name a node outside the output. The dedup pipelines satisfy
    * this by construction (pairs are generated FROM the corpus that is
    * passed as the universe).
    *
    * @param universe one id column (first column is used)
    */
  def connectedComponents(edges: DataFrame, universe: DataFrame,
                          maxIter: Int): DataFrame = {
    val idCol = universe.columns.head
    universe.select(col(idCol).as("id"))
      .join(connectedComponents(edges, maxIter), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  def connectedComponents(edges: DataFrame, universe: DataFrame): DataFrame =
    connectedComponents(edges, universe, 25)

  /** @param edges two id columns (first two columns are used); treated
    *              as undirected. Nodes not incident to any edge are not
    *              emitted — pass a `universe` (overload above) to get
    *              singletons too.
    * @param maxIter propagation rounds before switching to the
    *                large-star/small-star kernel (a diameter bound for
    *                the fast path, NOT a correctness bound — labels are
    *                exact either way)
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val Array(ca, cb, _*) = edges.columns
    val sym = edges.select(col(ca).as("u"), col(cb).as("v"))
      .union(edges.select(col(cb).as("u"), col(ca).as("v")))
      .localCheckpoint()

    // Round 1 needs no join: label(u) = min(u ∪ N(u)) directly.
    var labels = sym.select(col("u").as("id"), col("v").as("label"))
      .union(sym.select(col("u").as("id"), col("u").as("label")))
      .groupBy("id").agg(min("label").as("label"))
      .localCheckpoint()

    var converged = false
    var iter = 1
    while (!converged && iter < maxIter) {
      // node v hears the label of every neighbor u; keeps the min of
      // (own, heard). The previous label rides along inside the same
      // aggregate (each id has exactly one own=true row), so the
      // changed-row count is observable in the materializing job
      // itself — no second action, no probe join.
      val heard = sym.join(labels.withColumnRenamed("id", "u"), "u")
        .select(col("v").as("id"), col("label"), lit(false).as("own"))
      val obs = Observation()
      val next = labels.withColumn("own", lit(true)).union(heard)
        .groupBy("id").agg(
          min("label").as("label"),
          min(when(col("own"), col("label"))).as("_prev"))
        .observe(obs, coalesce(
          sum(when(col("label") =!= col("_prev"), 1L)), lit(0L)).as("changed"))
        .drop("_prev")
        .localCheckpoint() // eager: materializes and fires the metric
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      labels = next
      iter += 1
    }
    if (converged) labels.select(col("id"), col("label").as("cluster_id"))
    else connectedComponentsStar(edges) // diameter > maxIter: switch kernel
  }

  /** Alternating large-star/small-star CC — O(log² n) rounds on any
    * topology. Edge set is kept in canonical (u > v) orientation;
    * each op recomputes, per node, the minimum of its neighborhood and
    * rewires neighbors to it:
    *
    *   large-star: ∀v ∈ N(u), v > u:  emit (v, min(N(u) ∪ u))
    *   small-star: ∀v ∈ N⁻(u) ∪ u:    emit (v, min(N⁻(u) ∪ u))
    *
    * At the fixed point every edge is (member, component-min) — a star
    * — and labels read straight off the edge set. Convergence test is
    * a symmetric set difference (`except` both ways) on the canonical
    * edge set, which only runs once per full round on the shrinking
    * frontier.
    */
  def connectedComponentsStar(edges0: DataFrame, maxIter: Int = 64): DataFrame = {
    val Array(ca, cb, _*) = edges0.columns
    // Node universe of the INPUT (incl. self-loop-only nodes): the
    // output contract emits every edge-incident node.
    val nodes = edges0.select(col(ca).as("id"))
      .union(edges0.select(col(cb).as("id"))).distinct().localCheckpoint()

    def canon(e: DataFrame): DataFrame =
      e.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
                least(col("u"), col("v")).as("v"))
        .distinct()

    var cur = canon(edges0.select(col(ca).as("u"), col(cb).as("v")))
      .localCheckpoint()

    // large-star over the full (bidirected) neighborhood
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      canon(nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }

    // small-star over the smaller-id neighborhood (canonical u > v ⇒
    // grouping by u sees exactly N⁻(u); m < u always)
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min(col("v")).as("m"))
      val rewired = e.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
      val selfEdge = mins.select(col("u"), col("m").as("v"))
      canon(rewired.union(selfEdge))
    }

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      converged = next.except(cur).union(cur.except(next)).isEmpty
      cur = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds — " +
          "this exceeds the O(log² n) bound and indicates a bug, not a " +
          "large graph.")
    // Fixed point is a star forest: children point at their root; roots
    // and isolated nodes label themselves.
    nodes.join(cur.select(col("u").as("id"), col("v").as("cluster_id")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** PageRank in EXACT integer fixed-point arithmetic — the
    * domain/document authority signal a web-scale curation pipeline
    * ranks sources by (the CommonCrawl-style "rank the link graph,
    * keep the head" step), expressed so two engines can agree bit-
    * for-bit: ranks are micro-units (`rank_ppm`, node init 1 000 000),
    * each node contributes `rank_ppm div outdeg` along every out-edge
    * (integer division), and the update is
    *
    *   rank' = (100 − dampingPct)·10⁴ + (dampingPct · Σ contribs) div 100
    *
    * — all long arithmetic, so the result is independent of summation
    * order and identical on any engine (no cross-engine float-sum drift
    * to adjudicate). Mass lost to integer truncation and to dangling
    * nodes (no out-edges) simply evaporates — deterministic, and
    * irrelevant to the RANKING use of the scores.
    *
    * Shapes at 100 TB: the classic iterative kernel — per round ONE
    * equi-join (edges ⋈ ranks on src; ranks is the small side, AQE
    * broadcasts while it fits) and ONE map-side-combinable sum on dst.
    * Edges are localCheckpoint'ed once and reused every round; ranks are
    * localCheckpoint'ed per round so lineage stays O(1) — same
    * discipline as the CC kernels above. Iteration count is FIXED
    * (convergence-free determinism), the standard 5–20 rounds of the
    * published algorithm.
    *
    * @param edges directed (src, dst) — first two columns; parallel
    *              edges are collapsed (each neighbor heard once)
    * @param iters fixed iteration count (≥ 0: 0 returns the init ranks)
    * @param dampingPct damping factor in percent (the canonical 85)
    */
  def pageRankPpm(edges: DataFrame, iters: Int,
                  dampingPct: Int = 85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val Array(ca, cb, _*) = edges.columns
    val e = edges.select(col(ca).as("src"), col(cb).as("dst")).distinct()
    // outdeg rides ON the edge rows (window over the same src
    // partitioning — no extra exchange), so each iteration is ONE join
    // (edges ⋈ ranks) instead of two; the static edge+deg frame is
    // checkpointed once and reused every round.
    val eDeg = e.withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .localCheckpoint()
    val nodes = eDeg.select(col("src").as("id"))
      .union(eDeg.select(col("dst").as("id"))).distinct().localCheckpoint()

    val teleportPpm = (100L - dampingPct) * 10000L
    var ranks = nodes.select(col("id"), lit(1000000L).as("rank_ppm"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = eDeg
        .join(ranks, eDeg("src") === ranks("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(expr("rank_ppm div outdeg")).as("m"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(teleportPpm) +
            expr(s"$dampingPct * coalesce(m, 0L) div 100")).as("rank_ppm"))
        .localCheckpoint()
    }
    ranks
  }

  /** Exact triangle count per node — the clustering-coefficient /
    * community-density signal (the third graph kernel after CC and
    * PageRank; "how clique-ish is this node's neighborhood" is the
    * spam-farm vs organic-community discriminator web-corpus curation
    * uses alongside rank).
    *
    * Algorithm: DEGREE-ORDERED ORIENTATION (the MapReduce-classic
    * Suri & Vassilvitskii "Counting Triangles and the Curse of the Last
    * Reducer", WWW'11): orient every undirected edge from the
    * lower-(degree, id) endpoint to the higher one, so each triangle is
    * counted exactly once at its lowest corner, and — the scale point —
    * the join fan-out per node is bounded by its OUT-degree in the
    * oriented graph, which is O(√m) for ANY degree distribution. A
    * straight edge-edge self-join on the raw graph explodes on hub
    * nodes (a degree-d hub contributes d² wedge candidates); after
    * orientation a hub's edges point INTO it, and its wedge count
    * collapses. Two equi-joins + one aggregate, all on node keys; no
    * driver data.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val Array(ca, cb, _*) = edges.columns
    // canonical undirected edge set (dedup both directions, no loops)
    val und = edges.select(
        least(col(ca), col(cb)).as("u"), greatest(col(ca), col(cb)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint() // feeds degrees AND both join sides once
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id) — total order, so orientation is acyclic
    val o = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
      .localCheckpoint()
    // wedges at the lowest corner: s->t1, s->t2 (t1 < t2 by canonical
    // struct order); triangle iff oriented edge t1->t2 or t2->t1 exists
    // — after orientation both wedge arms leave the SAME node, so the
    // closing edge between t1,t2 is oriented (t1,t2)-canonically
    // unknown; check the undirected closure via the canonical edge set.
    val w = o.as("e1").join(o.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    val closed = w.join(
      und.select(least(col("u"), col("v")).as("b"),
        greatest(col("u"), col("v")).as("c")),
      Seq("b", "c"), "left_semi")
    // per-corner attribution: every triangle counted ONCE (at its
    // orientation-lowest corner); explode to all three members for the
    // per-node tally
    closed
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }

  /** Synchronous label propagation (community detection) — the fourth
    * graph kernel: after "which component" (CC), "how central"
    * (PageRank) and "how clique-ish" (triangles), LPA answers "which
    * COMMUNITY" — denser-than-chance neighborhoods inside one giant
    * component, the granularity used to diversify training corpora
    * (sample per community, not per component: one crawl snowball =
    * one component, many topics).
    *
    * Law (fully deterministic, unlike the randomized asynchronous
    * textbook LPA): labels start as the node's own id; each round,
    * every node SIMULTANEOUSLY adopts the most frequent label among
    * its neighbors and itself, ties broken by smallest label; fixed
    * `iters` rounds (convergence-free determinism, the q77 PageRank
    * discipline). All counts are integers and labels are compared with
    * plain ordering, so every engine agrees on every round.
    *
    * Shapes at 100 TB: per round ONE equi-join (symmetric edges ⋈
    * labels on the neighbor endpoint) and ONE partial-aggregable
    * argmin — `min_by(label, (−count, label))` collapses each
    * partition's vote table to ≤1 row per (node) before the exchange.
    * The symmetric edge frame is localCheckpoint'ed once; labels per
    * round, keeping lineage O(1). Hub fan-in is a count per distinct
    * neighbor label, not per neighbor — map-side combine absorbs it.
    *
    * @param edges undirected (a, b) — first two columns
    * @param iters fixed synchronous rounds (≥ 0: 0 returns id labels)
    * @return (id, community) — the node's label after `iters` rounds
    */
  /** k-core peel (fifth graph kernel): repeatedly delete nodes of
    * degree < k until the remainder — the k-core — is stable; returns
    * its nodes with their within-core degree. The density filter
    * behind "keep only well-connected entities" (spam rings, dense
    * co-occurrence hubs, link-farm detection).
    *
    * Fixed `iters` instead of a convergence probe ON PURPOSE: peeling
    * is monotone (the edge set only shrinks), so once the fixpoint is
    * reached every further round is a bit-identical no-op — a fixed
    * unroll shared with the oracle needs no cross-engine "did it
    * converge" agreement, and rounds after convergence cost one
    * already-stable aggregate + two joins. Pick iters ≥ the peel depth
    * (cascade length), not the graph size.
    *
    * Scale: each round is one partial-aggregable degree count and two
    * equi-joins on node id (the survivor set broadcasts once the peel
    * bites); no all-pairs stage, shuffle ∝ surviving edges — and the
    * edge set only ever shrinks.
    */
  def kCore(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val Array(ca, cb, _*) = edges.columns
    val und = edges.select(
        least(col(ca), col(cb)).as("u"), greatest(col(ca), col(cb)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val obs0 = org.apache.spark.sql.Observation()
    var sym = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint() // eager: materializes and fires the metric
    var edgesLeft = obs0.get("n").asInstanceOf[Long]
    // Convergence short-circuit: peeling is monotone, so a round that
    // deletes NO edge proves the fixpoint — every later round would be
    // a bit-identical no-op (the documented property the fixed unroll
    // leans on). The edge count rides the round's own materializing
    // localCheckpoint via Observation (the bfsLevels trick), so the
    // probe costs no extra job and the result is unchanged — only the
    // already-stable no-op rounds are skipped.
    var r = 1
    var stable = edgesLeft == 0L
    while (r <= iters && !stable) {
      // symmetric edge set ⇒ degree(u) = row count of u on the left.
      // The survivor set is NODE-bounded (the docstring's "broadcasts
      // once the peel bites") — but the checkpoint's size estimate is
      // edge-scale, so the planner would sort-merge and shuffle the
      // full edge set TWICE per round; the explicit hint keeps both
      // semi-filters exchange-free (guide §3.1).
      val keep = broadcast(sym.groupBy(col("u").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("id")))
      val obs = org.apache.spark.sql.Observation()
      sym = sym
        .join(keep.withColumnRenamed("id", "u"), Seq("u"))
        .join(keep.withColumnRenamed("id", "v"), Seq("v"))
        .select(col("u"), col("v"))
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      val n = obs.get("n").asInstanceOf[Long]
      stable = n == edgesLeft || n == 0L
      edgesLeft = n
      r += 1
    }
    sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Single-source BFS hop levels — unweighted shortest-path distance
    * from `source`, the navigation kernel the component/centrality
    * family lacked (CC answers WHETHER two nodes connect; this answers
    * HOW FAR). Frontier expansion over a monotone visited set: round r
    * joins the previous frontier against the symmetric edge set,
    * anti-joins out already-leveled nodes (a node's FIRST discovery is
    * its shortest hop count — the BFS invariant), and labels the
    * survivors r.
    *
    * Scale: each round is one equi-join (frontier ⋈ edges, shuffled on
    * node id) plus one left-anti against the visited set — never
    * all-pairs; the frontier side shrinks to the round's newly
    * discovered nodes, not the graph. Rounds are bounded by `maxDepth`
    * and an exhausted frontier short-circuits via the same Observation
    * trick as [[connectedComponents]] (the count rides the
    * materializing job, no second action). Visited state is O(V) rows,
    * localCheckpoint'd per round to truncate lineage — the identical
    * durability tier the CC kernels hold, with the identical cluster
    * note (reliable checkpoint dir on a real deployment).
    */
  def bfsLevels(edges: DataFrame, source: Long, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val Array(ca, cb, _*) = edges.columns
    val s = edges.sparkSession
    val sym = edges.select(
        col(ca).cast("long").as("u"), col(cb).cast("long").as("v"))
      .union(edges.select(
        col(cb).cast("long").as("u"), col(ca).cast("long").as("v")))
      .filter(col("u") =!= col("v"))
      .localCheckpoint()
    var levels = s.range(1)
      .select(lit(source).as("id"), lit(0).cast("int").as("lvl"))
      .localCheckpoint()
    var frontier = levels.select("id")
    var r = 1
    var exhausted = false
    while (r <= maxDepth && !exhausted) {
      val obs = org.apache.spark.sql.Observation()
      // frontier and visited set are NODE-bounded while sym is
      // edge-scale with an opaque checkpoint size estimate — broadcast
      // both small sides so no round shuffles the edge set (guide §3.1)
      val next = sym.join(broadcast(frontier.withColumnRenamed("id", "u")), "u")
        .select(col("v").as("id")).distinct()
        .join(broadcast(levels), Seq("id"), "left_anti")
        .select(col("id"), lit(r).cast("int").as("lvl"))
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint() // eager: materializes and fires the metric
      exhausted = obs.get("n").asInstanceOf[Long] == 0L
      levels = levels.union(next).localCheckpoint()
      frontier = next.select("id")
      r += 1
    }
    levels
  }

  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val Array(ca, cb, _*) = edges.columns
    val und = edges.select(
        least(col(ca), col(cb)).as("u"), greatest(col(ca), col(cb)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val sym = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    val nodes = sym.select(col("u").as("id")).distinct().localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("community"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val votes = sym
        .join(labels.select(col("id").as("v"), col("community")), Seq("v"))
        .select(col("u").as("id"), col("community"))
        .union(labels) // self-vote: stabilizes singleton-adjacent flips
      labels = votes
        .groupBy(col("id"), col("community"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("id"))
        .agg(min_by(col("community"),
          struct((col("n") * -1L).as("neg"), col("community"))).as("community"))
        .localCheckpoint()
    }
    labels
  }
}
