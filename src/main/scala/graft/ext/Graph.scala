package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step a near-dedup pipeline needs AFTER pair generation: LSH/Jaccard/
  * SimHash emit PAIRS, but keep-one-per-duplicate-group semantics need
  * the transitive closure (A~B, B~C ⇒ {A,B,C} is one group even when
  * A~C was never emitted). Every member gets its component's minimum id
  * as `cluster_id` — the canonical survivor choice.
  *
  * Algorithm: distributed min-label propagation (the Pregel/GraphX CC
  * kernel). Each round is one equi-join (edge ⋈ label) + one min
  * aggregate — both map-side combinable, shuffles only on node id,
  * never all-pairs. Rounds needed = the graph diameter; near-duplicate
  * components are quasi-cliques from band-bucket collisions, so
  * diameter stays in the low single digits no matter the corpus size
  * (the pathological long-chain graph is not what similarity banding
  * produces; if feeding arbitrary graphs, swap in the large-star/
  * small-star variant — same join shapes, O(log²) rounds).
  *
  * Driver loop discipline: the per-round convergence probe is
  * `isEmpty` on the changed-label set (a limit-1 boolean action), and
  * each round's labels are localCheckpoint'ed — lineage stays O(1) per
  * round instead of stacking the whole iteration history into one plan.
  * No data ever collects to the driver.
  */
object Graph {

  /** Components over the edge-incident nodes PLUS every node of
    * `universe` — isolated nodes come out as singletons with
    * `cluster_id = id`, which is the release semantics of
    * keep-one-per-duplicate-group over a full corpus (a document with
    * no near-dup pair is its own survivor). One extra left join on the
    * node id; the universe side is never iterated.
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
    * @throws IllegalStateException if labels still change at `maxIter` —
    *         silently returning non-converged (wrong) labels is never
    *         acceptable; raise maxIter (diameter rounds needed) or swap
    *         in the large-star/small-star variant for long-chain graphs.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val Array(ca, cb, _*) = edges.columns
    val sym = edges.select(col(ca).as("u"), col(cb).as("v"))
      .union(edges.select(col(cb).as("u"), col(ca).as("v")))
      .localCheckpoint()
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // node v hears the label of every neighbor u; keeps the min of
      // (own, heard) — one shuffle on the node id, partials combined
      // map-side
      val heard = sym.join(labels.withColumnRenamed("id", "u"), "u")
        .select(col("v").as("id"), col("label"))
      val next = labels.select(col("id"), col("label")).union(heard)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label"))
        .isEmpty
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "labels are still changing (graph diameter exceeds maxIter). " +
          "Raise maxIter or use a large-star/small-star formulation.")
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
