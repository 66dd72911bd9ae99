package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextHash.tokens

/** Corpus-level term statistics — TF-IDF top terms per document, the
  * classic keyword/topic signal a curation pipeline derives before
  * clustering or mixing a corpus (and the simplest "needs the whole
  * corpus, not just the row" text operator: document frequency is a
  * global aggregate).
  *
  * Shapes at 100 TB: term frequencies shuffle once on (doc, term) with
  * map-side combine; document frequencies aggregate the tf table on
  * term (combinable — the input is already one row per doc-term); the
  * tf⋈df equi-join is on the vocabulary, orders of magnitude smaller
  * than the corpus (AQE broadcasts it when it fits); the final top-k is
  * a per-document window on the already-aggregated rows. No all-pairs,
  * no driver data.
  *
  * Determinism contract: idf is FIXED-POINT — `idf_ppm =
  * round(ln(N/df)·10⁶)` as a long — so scores are exact integers
  * (`score_ppm = tf · idf_ppm`) and the top-k cut plus its (score desc,
  * term asc) tie-break replays identically on any engine. (The ppm
  * quantization is the cross-engine contract: both engines' `ln` would
  * have to disagree within 10⁻¹⁰ of a rounding boundary to diverge.)
  */
object Terms {

  /** Top-k terms per document by quantized TF-IDF.
    *
    * @param corpusN corpus document count (the one global scalar; both
    *                the caller and the oracle compute it with a count)
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int, corpusN: Long): DataFrame = {
    val terms = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // tf feeds BOTH the scoring side and the document-frequency side.
    // Without materialization the optimizer rewrites the df branch's
    // aggregate into a distinct, the two (id, term) exchanges stop
    // canonicalizing equal, ReuseExchange cannot fire, and the corpus
    // is scanned + shuffled twice (verified in TermsSpec). One
    // localCheckpoint makes the dominant shuffle run once.
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("idf_ppm",
        round(log(lit(corpusN.toDouble) / col("df").cast("double")) * 1e6)
          .cast("long"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score_ppm", col("tf") * col("idf_ppm"))
    val w = Window.partitionBy("id")
      .orderBy(col("score_ppm").desc, col("term"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("id", "term", "tf", "df", "score_ppm", "rk")
  }

  /** Bounded vocabulary build + per-document OOV coverage — the
    * tokenizer-prep step of a training pipeline: fix a top-V vocabulary
    * by corpus frequency, then score every document by how much of it
    * the vocabulary covers (the out-of-vocabulary rate that drives
    * "train a bigger tokenizer" / "drop this shard" decisions).
    *
    * Shapes at 100 TB: token counts shuffle once with map-side combine;
    * the top-V cut is `orderBy(cnt desc, term).limit(V)` — Spark plans
    * TakeOrderedAndProject, a DISTRIBUTED top-k (per-partition heaps,
    * driver merge of V-row partials), never a global sort and never a
    * single-partition window, so a billion-term junk vocabulary cannot
    * serialize the build. The vocabulary (≤ V rows by construction) then
    * broadcast-joins back to the token stream; per-document coverage is
    * one combinable aggregation. OOV rate is exact fixed-point ppm.
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be > 0, got $vocabSize")
    for (r <- Seq("_in_vocab", "n_tokens", "in_vocab", "oov_ppm"))
      require(!docs.columns.contains(r),
        s"input must not contain reserved column $r")
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      // both the count side and the coverage side consume this — one
      // materialization, one tokenize pass (the q61 tf discipline)
      .localCheckpoint()
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"), lit(true).as("_in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left_outer")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab"), 1L).otherwise(0L)).as("in_vocab"))
      .withColumn("oov_ppm",
        expr("(n_tokens - in_vocab) * 1000000L div n_tokens"))
  }

  /** Inverted index: term → document frequency + a BOUNDED posting list
    * (the lowest `cap` doc ids, ascending) + a truncation flag — the
    * search-index build step of a corpus pipeline, and the batch twin of
    * the q25 prefix-filter's posting-list expansion.
    *
    * Shapes at 100 TB: distinct (doc, term) pairs shuffle once with
    * map-side combine; the rank cut and the final aggregate share the
    * SAME partitioning key (term), so Spark plans ONE exchange for the
    * window + groupBy chain (asserted in TermsSpec). Aggregation state
    * is bounded by construction: `collect_list` only ever sees rows the
    * rank filter kept, so no stopword's posting list can exceed `cap`
    * entries in memory — the unbounded-collect trap at corpus scale is
    * structurally impossible, and full-fidelity consumers read `df` (the
    * exact count) rather than the sample of members.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    cap: Int): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val w = Window.partitionBy("term").orderBy("doc_id")
    pairs.withColumn("rn", row_number().over(w))
      .groupBy("term").agg(
        count(lit(1)).as("df"),
        sort_array(collect_list(when(col("rn") <= cap, col("doc_id"))))
          .as("postings"))
      .withColumn("truncated", col("df") > cap)
  }
}
