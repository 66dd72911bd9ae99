package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextHash.{rollingFingerprint, tokens}

/** Per-document text profiling for corpus curation: token counts,
  * quality scoring, stopword-based language identification, and a
  * rolling-hash content fingerprint. Pure projection work — every
  * column is a closed-form expression over the text, so the operator
  * is embarrassingly parallel (no shuffle at any scale) and the same
  * formulas are re-computable by the DuckDB oracle.
  */
object TextStats {

  /** Stopword marker sets per language for the n-gram/stopword
    * language-ID heuristic. Deliberately tiny — the point is the
    * operator shape (set-membership ratios + argmax), not lexicon
    * coverage; swap in real lexicons at deployment.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "en"))

  private def ratioIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))
      .cast("double") / size(toks).cast("double")

  /** BPE-ish pre-tokenizer regex (letter runs | single digits |
    * punctuation runs) — the classic GPT-2-style pre-split shape, so
    * `n_bpe_tokens` tracks subword-tokenizer counts far better than
    * whitespace counts on punctuation-heavy or digit-heavy text. Shared
    * verbatim with the DuckDB oracle (plain alternation + char classes,
    * identical in Java regex and RE2).
    */
  val BpeIshPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"

  /** The Gopher-rule stoplist (Rae et al. 2021, §A1.1 — the "contains
    * at least 2 of these" heuristic that kills keyword-stuffed and
    * non-prose documents).
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER QUALITY-RULE FILTER (Rae et al. 2021 §A1.1, the public
    * rule set FineWeb/Dolma-class pipelines still start from): one
    * boolean per rule plus the conjunction, so a curation run can
    * both FILTER on `pass` and AUDIT which rule rejected what —
    *  - word count in [50, 100000];
    *  - mean word length in [3, 10];
    *  - symbol-to-word ratio ≤ 0.1 for '#' and for '…'/'...';
    *  - ≥ 80% of words carry at least one alphabetic character;
    *  - ≥ `minStops` distinct [[GopherStops]] present (the paper's
    *    threshold is 2; corpora whose vocabulary barely intersects the
    *    English list tune it down — the law is the same membership
    *    count either way).
    * Every threshold compares in INTEGER cross-multiplied form
    * (`10·hashes ≤ words`, `3n ≤ Σlen ≤ 10n`, `5·alpha ≥ 4·words`) —
    * no float boundary can flip a document cross-engine. Pure
    * projection work: embarrassingly parallel, no shuffle at any
    * scale, the same closed forms recomputable by the oracle.
    */
  def gopherFlags(docs: DataFrame, idCol: String, textCol: String,
                  minStops: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    // lower projections alias the HOF expressions once (the profile()
    // CSE discipline — codegen does not deduplicate lambda folds):
    // the token array and its lowered image materialize one time each
    val arrs = docs.select(col(idCol).as("id"), col(textCol).as("_text"),
      toks.as("_tk"),
      transform(toks, t => lower(t)).as("_lt"))
    val base = arrs.select(
      col("id"),
      size(col("_tk")).cast("long").as("n_tokens"),
      aggregate(transform(col("_tk"), t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x).as("_tok_chars"),
      size(filter(col("_tk"), t => t.rlike("[A-Za-z]"))).cast("long")
        .as("_n_alpha"),
      ((length(col("_text")) -
        length(regexp_replace(col("_text"), "#", ""))).cast("long"))
        .as("_n_hash"),
      (((length(col("_text")) -
        length(regexp_replace(col("_text"), "\\.\\.\\.", ""))) / 3)
        .cast("long") +
        (length(col("_text")) -
          length(regexp_replace(col("_text"), "…", "")))
          .cast("long")).as("_n_ell"),
      size(filter(
        lit(GopherStops.toArray),
        w => array_contains(col("_lt"), w)))
        .cast("long").as("_n_stops"))
    base.select(
      col("id"), col("n_tokens"),
      (col("n_tokens") >= 50L && col("n_tokens") <= 100000L)
        .as("pass_word_count"),
      (col("_tok_chars") >= lit(3L) * col("n_tokens") &&
        col("_tok_chars") <= lit(10L) * col("n_tokens"))
        .as("pass_word_len"),
      (lit(10L) * col("_n_hash") <= col("n_tokens") &&
        lit(10L) * col("_n_ell") <= col("n_tokens"))
        .as("pass_symbols"),
      (lit(5L) * col("_n_alpha") >= lit(4L) * col("n_tokens"))
        .as("pass_alpha"),
      (col("_n_stops") >= minStops.toLong).as("pass_stopwords"))
      .withColumn("pass",
        col("pass_word_count") && col("pass_word_len") &&
          col("pass_symbols") && col("pass_alpha") &&
          col("pass_stopwords"))
  }

  /** Deterministic hashed-bag-of-words weight table for
    * [[linearQualityScore]]: `dims` integer micro-unit weights in
    * [−1000, 1000] ppm derived from md5 of fixed seeds (the
    * hyperplane-constant discipline — no RNG, and the oracle inlines
    * the identical literals). At deployment these are the TRAINED
    * model's quantized weights; the derivation here stands in for the
    * training run this engine does not own.
    */
  def linearWeights(dims: Int, seed: String): Seq[Long] =
    (0 until dims).map(b =>
      TextHash.seedLong(s"${seed}_w_$b") % 2001L - 1000L)

  /** fastText-style LINEAR quality scorer (Joulin et al. 2016 — the
    * model half of public curation next to the Gopher rule half,
    * q250; the CCNet/FineWeb-Edu classifier discipline): a document's
    * score is `bias + Σ_tokens w[hash60(token) mod dims]` — a hashed
    * bag-of-words dot product against a broadcast integer weight
    * table. SIGMOID-FREE on purpose: the keep decision compares in
    * the linear domain (`score > 0` ⇔ `sigmoid(score) > 0.5`), so
    * every arithmetic step is exact long addition and no float
    * boundary can flip a document cross-engine.
    *
    * Shape at 100 TB: one token explode + one BROADCAST join of the
    * `dims`-row weight table + one per-document sum (the single
    * shuffle, map-side combinable). Token multiplicity counts, as in
    * fastText's mean-of-embeddings with a frozen linear head.
    *
    * Output: (idCol, score_ppm, keep).
    */
  def linearQualityScore(docs: DataFrame, idCol: String,
                         textCol: String, dims: Int, seed: String,
                         biasPpm: Long): DataFrame = {
    require(dims > 0, s"dims must be > 0, got $dims")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = linearWeights(dims, seed).zipWithIndex
      .map { case (w, b) => (b.toLong, w) }.toDF("_ft_b", "_ft_w")
    docs.select(col(idCol).as("_ft_id"),
        explode(tokens(col(textCol))).as("_ft_tok"))
      .withColumn("_ft_b", TextHash.hash60(col("_ft_tok")) % dims)
      .join(broadcast(wdf), Seq("_ft_b"))
      .groupBy(col("_ft_id"))
      .agg((sum(col("_ft_w")) + lit(biasPpm)).as("score_ppm"))
      .select(col("_ft_id").as(idCol), col("score_ppm"),
        (col("score_ppm") > 0L).as("keep"))
  }

  /** Profile: id, n_chars, n_tokens (whitespace), n_bpe_tokens
    * (pre-tokenizer regex), avg_token_len, stopword_ratio (English
    * set), quality score in [0,1], language guess, and the rolling
    * fingerprint.
    *
    * quality = 0.4·min(1, n_tokens/100) + 0.3·(1 − stopword_ratio)
    *         + 0.3·min(1, avg_token_len/8) — a transparent stand-in for
    * a trained quality model; each term is a standard curation signal
    * (length, boilerplate-ness, word shape).
    */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("long")
    val avgLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") / nTok.cast("double")
    // Two-projection shape ON PURPOSE: the per-language ratios and the
    // token-fold average are higher-order-function expressions, which
    // codegen CSE does NOT deduplicate — a single flat select re-expands
    // every downstream reference (best/guess/quality), re-running the
    // whitespace split and the stopword filter ~20× per row. Aliasing
    // them in a lower projection evaluates each ONCE; CollapseProject
    // keeps the two projections apart precisely because the aliases are
    // non-cheap and multiply referenced.
    val ratios = docs.select(
      (col(idCol).as("id") +:
        col(textCol).as("_text") +:
        length(col(textCol)).cast("long").as("n_chars") +:
        nTok.as("n_tokens") +:
        size(regexp_extract_all(col(textCol), lit(BpeIshPattern), lit(0)))
          .cast("long").as("n_bpe_tokens") +:
        avgLen.as("avg_token_len") +:
        stopwords.map { case (lang, words) =>
          ratioIn(toks, words).as(s"_r_$lang")
        }): _*)
    // argmax with first-listed-language tie-break; all-zero → "und"
    val best = stopwords.map { case (lang, _) => col(s"_r_$lang") }
      .reduce((a, b) => greatest(a, b))
    val guess = stopwords.foldRight(lit("und"): Column) {
      case ((lang, _), rest) =>
        when(col(s"_r_$lang") === best && best > 0.0, lang).otherwise(rest)
    }
    // the "primary language" ratio is the HEAD of the stopwords list by
    // contract — derive the column name from it so reordering/renaming
    // the list can never silently change the quality score
    val rHead = col(s"_r_${stopwords.head._1}")
    val quality =
      lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / 100.0) +
        lit(0.3) * (lit(1.0) - rHead) +
        lit(0.3) * least(lit(1.0), col("avg_token_len") / 8.0)
    ratios.select(
      col("id"), col("n_chars"), col("n_tokens"), col("n_bpe_tokens"),
      col("avg_token_len"),
      rHead.as("stopword_ratio"),
      quality.as("quality"),
      guess.as("lang_guess"),
      rollingFingerprint(col("_text")).as("fingerprint"))
  }

  /** Intra-document repetition profile — the Gopher/C4-style quality
    * rule that a text profile alone cannot express: a document whose
    * n-grams keep repeating (boilerplate, keyword stuffing, template
    * spam) is low-value training data even when its length and word
    * shape look fine.
    *
    * Per document, over the NON-distinct word n-gram multiset:
    *   dup_ngram_ratio = 1 − distinct/total   (0 for docs with < n tokens)
    *   top_ngram_ratio = max-frequency/total  (0 likewise)
    *   keep            = dup ratio under its threshold AND the top
    *                     ratio under its threshold OR the top gram
    *                     occurring only once — a singleton gram is not
    *                     repetition, however short the document (a
    *                     2-trigram doc has top ratio 0.5 with zero
    *                     actual repetition; a raw ratio test would
    *                     reject every short doc)
    *
    * ONE exploded aggregation produces all three counts (sum, count,
    * max over per-gram frequencies — each map-side combinable), then a
    * left join back to the id universe restores gram-less docs. Shape:
    * shuffle on (id, gram) then on id — the standard per-document
    * aggregation pair, linear at any corpus size.
    *
    * Ratios are single IEEE divisions of exact longs, so the DuckDB
    * twin reproduces them bit-for-bit.
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, maxDupRatio: Double,
                        maxTopRatio: Double): DataFrame = {
    // all positional n-grams, duplicates preserved, via the native
    // expression (distinct=false). The Column composition
    // (transform(sequence) + slice + array_join) re-evaluated the
    // whitespace split 4× per row and ran three nested interpreted
    // HOFs per gram — 3.6 s at sf0.1 vs 0.7 s native.
    val grams =
      graft.plans.ShinglesExpr.shinglesAll(tokens(col(textCol)), n)
    val counts = docs
      .select(col(idCol).as("id"), explode(grams).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum("c").as("n_ngrams"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_freq"))
    val total = col("n_ngrams").cast("double")
    docs.select(col(idCol).as("id")).join(counts, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("top_freq"), lit(0L)).as("top_freq"),
        when(col("n_ngrams").isNull, 0.0)
          .otherwise(lit(1.0) - col("n_distinct").cast("double") / total)
          .as("dup_ngram_ratio"),
        when(col("n_ngrams").isNull, 0.0)
          .otherwise(col("top_freq").cast("double") / total)
          .as("top_ngram_ratio"))
      .withColumn("keep",
        col("dup_ngram_ratio") <= maxDupRatio &&
          (col("top_freq") <= 1L || col("top_ngram_ratio") <= maxTopRatio))
  }
}
