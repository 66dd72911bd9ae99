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

  /** @param edges two id columns (first two columns are used); treated
    *              as undirected. Nodes not incident to any edge are not
    *              emitted (callers wanting singletons: union the id
    *              universe with cluster_id = id).
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
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
