package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextHash.tokens

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING — the second
  * public tokenizer family next to BPE (Kudo 2018, arXiv:1804.10959):
  * seed a candidate vocabulary from frequent substrings, fit a
  * unigram language model by EM over each word's segmentation
  * lattice, prune low-contribution pieces, iterate; the surviving
  * scored pieces ARE the tokenizer model artifact. This
  * implementation is the HARD-EM (Viterbi) variant in exact integer
  * fixed point, so the trained vocabulary is bit-identical across
  * engines and reruns:
  *
  *  - piece scores are MICRO-LOG longs — `round(ln((cnt + 1) /
  *    (total + |V|)) * 1e6)` (Laplace-smoothed unigram probability;
  *    one `ln` of one exact-double rational, the q252 DSIR
  *    discipline) — so Viterbi path comparisons are exact integer
  *    sums, never float accumulations;
  *  - the E-step segments each distinct word by Viterbi DP over its
  *    positions (ties: the larger path score, then the SMALLER piece
  *    start — the longest-final-piece rule), and piece counts are
  *    the path occurrences weighted by word frequency;
  *  - the M-step rescores from those counts and PRUNES: single
  *    characters never prune (SentencePiece's required-character
  *    rule — every word stays segmentable), multi-character pieces
  *    keep only the used (count > 0) top ⌈3n/4⌉ by (count desc,
  *    piece asc) — Kudo's shrink-by-a-quarter-per-iteration
  *    schedule on the hard-count loss.
  *
  * Shape at 100 TB: the corpus is touched ONCE (the word-frequency
  * aggregation, map-side combinable — the q106 BPE discipline);
  * everything after runs on the DISTINCT-WORD table joined against
  * the vocabulary-bounded piece table. The Viterbi DP is UNROLLED
  * over word positions (bounded by `maxWordLen`, checked loudly):
  * each position is one bounded equi-join + aggregation, and the
  * backtrack is the same number of argmax steps — never a per-row
  * recursive UDF, never a driver loop over data rows. The only
  * driver-side values are vocabulary sizes (bounded metadata, the
  * Bloom-bitmap exception).
  */
object Unigram {

  /** Train and return the final vocabulary: one row per piece —
    * (piece, count, score_ulog), the trained model artifact. `count`
    * is the piece's weighted occurrence count on the final Viterbi
    * paths; `score_ulog` its micro-log unigram score.
    */
  def train(docs: DataFrame, textCol: String, seedMulti: Int,
            emRounds: Int, vocabSize: Int, maxPieceLen: Int = 4,
            maxWordLen: Int = 8): DataFrame =
    trainState(docs, textCol, seedMulti, emRounds, vocabSize,
      maxPieceLen, maxWordLen)._3

  /** ENCODE under the trained tokenizer: per-document word and
    * subword counts after unigram-LM training — q108's question
    * (how many tokens is my corpus under the REAL trained model)
    * asked of the second tokenizer family. One more Viterbi pass
    * segments every DISTINCT word under the FINAL vocabulary's
    * scores; the per-word subword table is vocabulary-bounded and
    * broadcasts back to the token stream (the q92/q108 join shape).
    * `subwords_per_word_ppm` is exact integer fixed point.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             seedMulti: Int, emRounds: Int, vocabSize: Int,
             maxPieceLen: Int = 4, maxWordLen: Int = 8): DataFrame = {
    val (words, cands, fin) = trainState(docs, textCol, seedMulti,
      emRounds, vocabSize, maxPieceLen, maxWordLen)
    val edges = cands
      .join(fin.select(col("piece"), col("score_ulog").as("sc")),
        "piece")
      .select(col("w"), col("i"), col("j"), col("piece"), col("sc"))
      .localCheckpoint()
    val perWord = viterbiPicks(words, edges, maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("nsw"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(perWord), "w")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(col("nsw")).as("n_subwords"))
      .withColumn("subwords_per_word_ppm",
        expr("n_subwords * 1000000L div n_words"))
  }

  /** One Viterbi segmentation pass over every distinct word under
    * `edges` (w, i, j, piece, sc): the position-unrolled forward DP
    * followed by the argmax backtrack; returns one row per path
    * piece occurrence — (w, piece, pos). Shared by the EM loop and
    * [[encode]].
    */
  private def viterbiPicks(words: DataFrame, edges: DataFrame,
                           maxWordLen: Int): DataFrame = {
    // Planning-floor discipline (optimization guide §7.3, measured in
    // round 19): the corpus contributes nothing here — the frames are
    // vocabulary/word-bounded — so the cost of the unrolled DP is
    // Catalyst PLANNING, not execution (q264 before the rewrite: 115
    // jobs totaling 6.5 s of execution inside ~85 s of wall). Chained
    // `unionByName` accumulators double the logical tree per step and
    // every eager localCheckpoint re-optimizes the whole accumulated
    // history; per-step checkpoints + FLAT unions of checkpointed
    // leaves keep every planned tree one join deep, so planning stays
    // O(steps) instead of O(2^steps-ish).
    var best = words.select(col("w"), lit(0).as("pos"), lit(0L).as("best"))
      .localCheckpoint()
    for (j <- 1 to maxWordLen) {
      val bj = edges.filter(col("j") === j).as("e")
        .join(best.as("b"),
          col("e.w") === col("b.w") && col("b.pos") === col("e.i"))
        .groupBy(col("e.w").as("w"))
        .agg(max(col("b.best") + col("e.sc")).as("best"))
        .select(col("w"), lit(j).as("pos"), col("best"))
      best = best.unionByName(bj).localCheckpoint()
    }
    // Backtrack. The chosen predecessor at (w, end-position j) —
    // argmax over edges e with e.j = j of best[e.i] + e.sc, ties to the
    // smaller start — does NOT depend on the path the backtrack took to
    // reach j, so it is precomputed ONCE for every (w, j) as a single
    // hash aggregate (min over the struct (-score, start, piece) ≡ the
    // (score desc, start asc) tie-break; (w, j, start) determines the
    // piece, so the struct order never reaches the piece field). Each
    // backtrack step is then ONE tiny equi-join against `succ` instead
    // of the former per-step 3-way join + window.
    val succ = edges.as("e")
      .join(best.as("b"),
        col("e.w") === col("b.w") && col("b.pos") === col("e.i"))
      .groupBy(col("e.w").as("w"), col("e.j").as("j"))
      .agg(min(struct((-(col("b.best") + col("e.sc"))).as("nscore"),
        col("e.i").as("pos"), col("e.piece").as("piece"))).as("m"))
      .select(col("w"), col("j"), col("m.pos").as("pos"),
        col("m.piece").as("piece"))
      .localCheckpoint()
    var cursor = words.select(col("w"), length(col("w")).as("pos"))
    var picks: DataFrame = null
    for (_ <- 1 to maxWordLen) {
      val step = cursor.filter(col("pos") > 0).as("c")
        .join(succ.as("s"),
          col("s.w") === col("c.w") && col("s.j") === col("c.pos"))
        .select(col("c.w").as("w"), col("s.piece").as("piece"),
          col("s.pos").as("pos"))
        .localCheckpoint()
      picks = if (picks == null) step else picks.unionByName(step)
      cursor = step.select(col("w"), col("pos"))
    }
    picks
  }

  /** The training loop's full state: (distinct words with
    * frequencies, candidate piece occurrences, the final scored
    * vocabulary). Shared by [[train]] (the artifact) and [[encode]]
    * (one more segmentation pass under it).
    */
  private def trainState(docs: DataFrame, textCol: String,
      seedMulti: Int, emRounds: Int, vocabSize: Int, maxPieceLen: Int,
      maxWordLen: Int): (DataFrame, DataFrame, DataFrame) = {
    require(seedMulti >= 1 && emRounds >= 1 && vocabSize >= 1,
      s"seedMulti ($seedMulti), emRounds ($emRounds) and vocabSize " +
        s"($vocabSize) must all be >= 1")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    // ONE corpus pass: word frequencies (the weighted training set)
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val longest = words.agg(max(length(col("w")))).head().getInt(0)
    require(longest <= maxWordLen,
      s"a corpus word has $longest characters > maxWordLen=" +
        s"$maxWordLen — raise the knob (it bounds the position-" +
        "unrolled Viterbi; SentencePiece's own trainer caps sentence " +
        "pieces the same way)")
    // every candidate piece occurrence: (w, i, j) half-open on
    // 0-indexed positions, piece = w[i, j), j - i <= maxPieceLen
    val cands = words.select(col("w"), col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(0, length(w) - 1), i ->
             |  transform(sequence(i + 1,
             |      least(length(w), i + $maxPieceLen)), j ->
             |    struct(i AS i, j AS j,
             |      substring(w, i + 1, j - i) AS piece))))""".stripMargin))
          .as("c"))
      .select(col("w"), col("freq"), col("c.i").as("i"),
        col("c.j").as("j"), col("c.piece").as("piece"))
      .localCheckpoint()
    // seed vocabulary: every single character (coverage) + the top
    // `seedMulti` multi-character substrings by weighted occurrence
    val occ = cands.groupBy("piece").agg(sum("freq").as("cnt"))
    val seed = occ.filter(length(col("piece")) === 1).unionByName(
      occ.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(seedMulti))

    // Laplace-smoothed micro-log scores from counts — one ln of one
    // exact rational per piece (cross-engine exact after rounding)
    def scored(v: DataFrame): DataFrame = {
      val tot = v.agg(sum(col("cnt")).cast("long").as("t"),
        count(lit(1)).as("nv"))
      v.crossJoin(broadcast(tot))
        .withColumn("score_ulog",
          round(log((col("cnt") + lit(1.0)) / (col("t") + col("nv")))
            * lit(1e6)).cast("long"))
        .select(col("piece"), col("cnt"), col("score_ulog"))
    }

    var vocab = scored(seed).localCheckpoint()
    for (_ <- 1 to emRounds) {
      val edges = cands
        .join(vocab.select(col("piece"), col("score_ulog").as("sc")),
          "piece")
        .select(col("w"), col("i"), col("j"), col("piece"), col("sc"))
        .localCheckpoint()
      // E-step: Viterbi path pieces (forward DP + argmax backtrack),
      // counted weighted by word frequency
      val picks = viterbiPicks(words, edges, maxWordLen)
      val counts = picks.join(words, "w")
        .groupBy("piece").agg(sum("freq").as("cnt"))
      val recounted = vocab.select("piece")
        .join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      // M-step prune: characters always survive; used multi-char
      // pieces keep the top ceil(3/4 of the current multi count)
      val nMulti = vocab.filter(length(col("piece")) > 1).count()
      val keepN = ((nMulti * 3) + 3) / 4
      val kept = recounted.filter(length(col("piece")) === 1)
        .unionByName(
          recounted.filter(length(col("piece")) > 1 && col("cnt") > 0)
            .orderBy(col("cnt").desc, col("piece"))
            .limit(keepN.toInt))
      vocab = scored(kept).localCheckpoint()
    }
    // final artifact: characters + the top multi-char pieces up to
    // vocabSize, scored as trained
    val nChars = vocab.filter(length(col("piece")) === 1).count()
    val fin = vocab.filter(length(col("piece")) === 1).unionByName(
        vocab.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece"))
          .limit(math.max(0L, vocabSize - nChars).toInt))
      .select(col("piece"), col("cnt").as("count"), col("score_ulog"))
      .localCheckpoint()
    (words, cands, fin)
  }
}
