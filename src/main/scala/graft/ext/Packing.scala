package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextHash.hash60

/** Token-budget shard packing — the last step of a training-data
  * pipeline: give every document a deterministic position in the
  * training stream (shard, batch) so that each batch holds ~`budget`
  * tokens of hash-shuffled documents.
  *
  * The "global shuffle" is the hash itself: ordering a shard by
  * hash60(salt|id) IS a uniform deterministic permutation of its
  * documents, so no RNG and no shuffle-the-shuffle pass — re-salting
  * yields an independent order. A document's batch is the batch
  * containing its START offset in the shard's running token count.
  *
  * Scale shape: one exchange on the shard id, then a per-shard sort +
  * running sum (one analytic window, never a global sort). One shard is
  * one task's sort: size `nShards` ∝ corpus/executor-memory (the same
  * sizing rule as shuffle partitions) so per-shard volume stays
  * bounded as the corpus grows.
  */
object Packing {

  /** @param tokenCount expression giving the document's token count
    *                   (e.g. `size(tokens(col("text")))`, or a
    *                   precomputed column).
    */
  def packShards(df: DataFrame, idCol: String, tokenCount: Column,
                 nShards: Int, budget: Long, salt: String): DataFrame = {
    val h = hash60(concat(lit(salt), col(idCol).cast("string")))
    val shard = (h % nShards).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id"), tokenCount.cast("long").as("n_tokens"),
        h.as("h"), shard.as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // batch of the row's START offset; double division is exact here
      // (cum ≪ 2^53) and evaluates identically on both engines
      .withColumn("batch_id",
        floor((col("cum") - col("n_tokens")).cast("double") / budget)
          .cast("long"))
      .select(col("id"), col("shard"), col("batch_id"), col("n_tokens"))
  }
}
