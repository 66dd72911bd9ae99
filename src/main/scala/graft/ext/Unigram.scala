package graft.ext

import org.apache.spark.sql.{DataFrame, Observation}
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
  * the vocabulary-bounded piece table. The Viterbi segmentation is
  * solved by ENUMERATION over the constant composition table (word
  * lengths bounded by `maxWordLen`, checked loudly; pieces by
  * `maxPieceLen` — ≤ 223 compositions at the 8/4 defaults): one
  * bounded join + argmax aggregation per pass — never a per-row
  * recursive UDF, never a driver loop over data rows. The only
  * driver-side values are vocabulary sizes and the composition
  * table (bounded metadata, the Bloom-bitmap exception).
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
    // edges stays lazy: both of viterbiPicks' consumers sit inside ONE
    // action, and cands/fin are already checkpointed leaves — a
    // checkpoint here would only add a job (guide §7.3 job floor).
    val edges = cands
      .join(fin.select(col("piece"), col("score_ulog").as("sc")),
        "piece")
      .select(col("w"), col("i"), col("j"), col("piece"), col("sc"))
    val perWord = viterbiPicks(words, edges, maxWordLen, maxPieceLen)
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
    * `edges` (w, i, j, piece, sc); returns one row per path piece
    * occurrence — (w, piece, pos). Shared by the EM loop and
    * [[encode]].
    *
    * Job-floor discipline (optimization guide §7.3, measured in
    * rounds 19–20): the frames here are vocabulary/word-bounded, so
    * the cost is per-JOB overhead, not execution — the former
    * position-unrolled DP paid one eager localCheckpoint per forward
    * step and per backtrack step (17 jobs per pass, ~65 per q264).
    * Because `maxWordLen` and `maxPieceLen` are small, bounded knobs,
    * the whole segmentation space is enumerable up front: a word of
    * length L has at most 108 (L ≤ 8, pieces ≤ 4) compositions into
    * piece spans, a DRIVER-SIDE constant table (bounded metadata, the
    * Bloom-bitmap exception — never corpus-dependent). One job scores
    * every composition whose pieces all exist in the vocabulary and
    * takes the per-word argmax.
    *
    * Tie-break equivalence with the DP backtrack (score desc, then
    * smaller piece start at each step from the END of the word): every
    * maximum-score path has optimal prefixes at all its cut points, and
    * the backtrack picks the smallest last-piece start among them, then
    * recurses — i.e. exactly the lexicographically smallest
    * END-TO-START starts sequence among maximum-score compositions.
    * `rstarts` (the composition's piece starts read from the end; a
    * strictly decreasing sequence ending in 0, so never a proper prefix
    * of a competitor) is that sort key, precomputed per composition.
    */
  private[graft] def viterbiPicks(words: DataFrame, edges: DataFrame,
                                  maxWordLen: Int, maxPieceLen: Int): DataFrame = {
    val comps = compositionSegments(words, maxWordLen, maxPieceLen)
    val winners = words.select(col("w"), length(col("w")).as("len"))
      .join(broadcast(comps), "len")
      .join(edges, Seq("w", "i", "j"))
      .groupBy(col("w"), col("comp_id"), col("n_segs"), col("rstarts"))
      .agg(count(lit(1)).as("n"), sum(col("sc")).as("score"))
      .filter(col("n") === col("n_segs"))
      .groupBy("w")
      .agg(min(struct((-col("score")).as("nscore"),
        col("rstarts").as("rstarts"), col("comp_id").as("cid"))).as("m"))
      .select(col("w"), col("m.cid").as("comp_id"))
    winners
      .join(broadcast(comps.select("comp_id", "i", "j")), "comp_id")
      .join(edges, Seq("w", "i", "j"))
      .select(col("w"), col("piece"), col("i").as("pos"))
  }

  /** The constant composition table: one row per piece span of every
    * composition of every length 1..maxWordLen into spans of
    * 1..maxPieceLen — (len, comp_id, n_segs, rstarts, i, j), comp_id
    * globally unique, rstarts the end-to-start span starts (the
    * backtrack tie-break key). ≤ 223 compositions / ≤ 800 rows at the
    * 8/4 defaults; pure bounded metadata.
    */
  private def compositionSegments(words: DataFrame, maxWordLen: Int,
                                  maxPieceLen: Int): DataFrame = {
    def comps(len: Int): Seq[Seq[(Int, Int)]] =
      if (len == 0) Seq(Seq.empty)
      else (1 to math.min(maxPieceLen, len)).flatMap(p =>
        comps(len - p).map(_ :+ (len - p, len)))
    val rows = for {
      (segs, compId) <- (1 to maxWordLen).flatMap(comps).zipWithIndex
      rstarts = segs.reverse.map(_._1)
      (i, j) <- segs
    } yield (segs.last._2, compId, segs.size, rstarts, i, j)
    val spark = words.sparkSession
    import spark.implicits._
    rows.toDF("len", "comp_id", "n_segs", "rstarts", "i", "j")
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

    // The per-vocab single/multi piece counts ride each vocab
    // checkpoint's own materializing job via Observation (the
    // kCore/bfsLevels trick) — the former per-round `count()` probe
    // jobs cost nothing extra now (guide §7.3 job floor).
    def sized(v: DataFrame): (DataFrame, Observation) = {
      val obs = Observation()
      val ck = v.observe(obs,
        coalesce(sum(when(length(col("piece")) > 1, 1L)), lit(0L))
          .as("n_multi"),
        coalesce(sum(when(length(col("piece")) === 1, 1L)), lit(0L))
          .as("n_chars"))
        .localCheckpoint()
      (ck, obs)
    }

    var (vocab, vocabObs) = sized(scored(seed))
    for (_ <- 1 to emRounds) {
      // edges stays lazy: its only consumers sit inside the one
      // counts action below, over already-checkpointed leaves
      val edges = cands
        .join(vocab.select(col("piece"), col("score_ulog").as("sc")),
          "piece")
        .select(col("w"), col("i"), col("j"), col("piece"), col("sc"))
      // E-step: Viterbi path pieces, counted weighted by word frequency
      val picks = viterbiPicks(words, edges, maxWordLen, maxPieceLen)
      val counts = picks.join(words, "w")
        .groupBy("piece").agg(sum("freq").as("cnt"))
      val recounted = vocab.select("piece")
        .join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      // M-step prune: characters always survive; used multi-char
      // pieces keep the top ceil(3/4 of the current multi count)
      val nMulti = vocabObs.get("n_multi").asInstanceOf[Long]
      val keepN = ((nMulti * 3) + 3) / 4
      val kept = recounted.filter(length(col("piece")) === 1)
        .unionByName(
          recounted.filter(length(col("piece")) > 1 && col("cnt") > 0)
            .orderBy(col("cnt").desc, col("piece"))
            .limit(keepN.toInt))
      val (v2, o2) = sized(scored(kept))
      vocab = v2
      vocabObs = o2
    }
    // final artifact: characters + the top multi-char pieces up to
    // vocabSize, scored as trained
    val nChars = vocabObs.get("n_chars").asInstanceOf[Long]
    val fin = vocab.filter(length(col("piece")) === 1).unionByName(
        vocab.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece"))
          .limit(math.max(0L, vocabSize - nChars).toInt))
      .select(col("piece"), col("cnt").as("count"), col("score_ulog"))
      .localCheckpoint()
    (words, cands, fin)
  }
}
