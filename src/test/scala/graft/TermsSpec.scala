package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.ext.Terms

/** Plan-shape contract for the corpus TF-IDF operator: the tf
  * aggregation feeds BOTH the per-doc scoring side and the
  * document-frequency side — the (id, term) exchange must be computed
  * once and REUSED, not evaluated twice (at 100 TB it is the dominant
  * shuffle).
  */
class TermsSpec extends SparkSpec {
  import spark.implicits._

  test("tfIdfTopK: the corpus is exploded and shuffled ONCE (tf materialized)") {
    val docs = (0L until 200L)
      .map(i => (i, s"alpha beta g$i delta ${if (i % 2 == 0) "even" else "odd"}"))
      .toDF("doc_id", "text")
    val out = Terms.tfIdfTopK(docs, "doc_id", "text", 3, 200L)
    out.collect() // materialize so AQE finalizes the plan
    val plan = out.queryExecution.executedPlan
    val finalPlan = plan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(plan)
    val s = finalPlan.toString
    // both consumers must read the checkpointed tf scan — a second
    // Generate(explode) in the executed plan means the corpus-wide
    // shuffle is being recomputed for the df side
    assert(!s.contains("Generate explode"),
      s"expected both tf consumers to read the checkpointed scan; " +
        s"got plan:\n$s")
    assert(s.contains("Scan ExistingRDD") || s.contains("LogicalRDD"),
      s"expected a checkpointed tf scan in the plan:\n$s")
  }
}
