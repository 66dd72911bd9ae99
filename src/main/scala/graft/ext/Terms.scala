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
}
