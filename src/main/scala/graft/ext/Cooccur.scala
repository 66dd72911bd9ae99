package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextHash.tokens

/** Frequent term-pair co-occurrence with PMI — the association-mining
  * step behind collocation discovery ("new york"), topic co-occurrence
  * maps, and phrase-vocabulary induction for tokenizers (the next step
  * after q92's unigram vocabulary). A-priori pruned: a pair can only be
  * frequent if both members are, so the pair expansion runs over
  * support-filtered terms ONLY.
  *
  * Shape at 100 TB: distinct (doc, term) pairs shuffle once (map-side
  * combine); document frequencies aggregate that table; the frequent
  * vocabulary (bounded by min-support — the a-priori guarantee, and
  * orders of magnitude smaller than the term universe) BROADCASTS back
  * to prune the posting table before the per-document pair expansion —
  * the same bounded posting-list expansion q25's ssjoin uses, never an
  * all-pairs product over the vocabulary. Pair support then aggregates
  * with map-side combine. PMI is fixed-point ppm under the q61
  * contract: the argument of the single `ln` is one IEEE division of
  * two exact integer products.
  */
object Cooccur {

  /** Frequent co-occurring term pairs (document-level support) + PMI.
    *
    * @param minSupport minimum document frequency for terms AND pairs
    * @param corpusN    corpus document count (caller-computed scalar,
    *                   same convention as Terms.tfIdfTopK)
    * Output: term_a < term_b, n_a, n_b (term doc-freqs), n_ab (pair
    * doc-freq), pmi_ppm = round(ln(n_ab·N / (n_a·n_b))·10⁶).
    */
  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
                    minSupport: Int, corpusN: Long): DataFrame = {
    require(minSupport > 0, s"minSupport must be > 0, got $minSupport")
    val pairs = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      // feeds the df aggregate AND the pair expansion — the q61
      // one-materialization discipline
      .localCheckpoint()
    val freq = pairs.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minSupport)
    val ft = pairs.join(broadcast(freq), "term")
    val a = ft.select(col("doc_id"), col("term").as("term_a"),
      col("df").as("n_a"))
    val b = ft.select(col("doc_id"), col("term").as("term_b"),
      col("df").as("n_b"))
    a.join(b, "doc_id")
      .filter(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
      .withColumn("pmi_ppm",
        round(log((col("n_ab") * lit(corpusN)).cast("double") /
          (col("n_a") * col("n_b")).cast("double")) * 1e6).cast("long"))
  }
}
