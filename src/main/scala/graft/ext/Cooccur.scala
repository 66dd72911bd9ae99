package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Per-document expansion bound (see frequentPairs): one document
    * contributes at most maxDocTokens·(maxDocTokens−1)/2 pairs — ~2M at
    * the default — so one pathological 100k-frequent-token document
    * cannot quadratically dominate a task. Far above any realistic
    * document's DISTINCT frequent-token count (support-filtered
    * vocabularies are small by construction), so the default is a
    * guard, not a precision knob.
    */
  val DefaultMaxDocTokens = 2000

  /** Frequent co-occurring term pairs (document-level support) + PMI.
    *
    * @param minSupport   minimum document frequency for terms AND pairs
    * @param corpusN      corpus document count (caller-computed scalar,
    *                     same convention as Terms.tfIdfTopK)
    * @param maxDocTokens cap on DISTINCT frequent tokens per document
    *                     entering the pair expansion — the most-frequent
    *                     (df desc, term asc — deterministic) survive.
    *                     Documents under the cap (the normal case) are
    *                     counted exactly; a rare over-cap document
    *                     undercounts pairs of its rarest terms rather
    *                     than expanding O(k²) unboundedly.
    * Output: term_a < term_b, n_a, n_b (term doc-freqs), n_ab (pair
    * doc-freq), pmi_ppm = round(ln(n_ab·N / (n_a·n_b))·10⁶).
    */
  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
                    minSupport: Int, corpusN: Long,
                    maxDocTokens: Int = DefaultMaxDocTokens): DataFrame = {
    require(minSupport > 0, s"minSupport must be > 0, got $minSupport")
    require(maxDocTokens > 1, s"maxDocTokens must be > 1, got $maxDocTokens")
    val pairs = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      // feeds the df aggregate AND the pair expansion — the q61
      // one-materialization discipline
      .localCheckpoint()
    val freq = pairs.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minSupport)
    // Per-document expansion bound: keep the maxDocTokens most-frequent
    // terms per doc (deterministic tie-break). The row_number window
    // partitions on doc_id — the SAME key the pair-expansion self-join
    // shuffles on — so the guard rides the exchange the join needs
    // anyway rather than adding one.
    val wDoc = Window.partitionBy("doc_id")
      .orderBy(col("df").desc, col("term"))
    val ft = pairs.join(broadcast(freq), "term")
      .withColumn("_rk", row_number().over(wDoc))
      .filter(col("_rk") <= maxDocTokens)
      .drop("_rk")
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
