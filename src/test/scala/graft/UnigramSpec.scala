package graft

import org.apache.spark.sql.functions._
import graft.ext.Unigram

/** Unigram-LM tokenizer training (Kudo 2018, hard-EM Viterbi in
  * integer micro-log fixed point) — closed-form fixture: a corpus
  * where the selected vocabulary and path counts are hand-derivable.
  */
class UnigramSpec extends SparkSpec {

  test("the trained vocabulary is the closed form: used pieces " +
       "survive with their weighted path counts, unused pieces prune, " +
       "characters are exempt") {
    import spark.implicits._
    // "abab" x3, "ab" x2, "cd" x1. Seed multi (maxPieceLen=2, top 3
    // by weighted occurrence): ab(8), ba(3), cd(1). Viterbi under the
    // seed scores segments abab = ab|ab (two pieces beat any
    // char-mixed path), ab = ab, cd = cd (one piece beats c|d) — so
    // ab counts 3*2 + 2 = 8, cd counts 1, ba is unused and prunes,
    // and no single character sits on any path (count 0, kept by the
    // coverage exemption).
    val docs = Seq("abab abab abab ab ab cd").toDF("text")
    val out = Unigram.train(docs, "text", seedMulti = 3, emRounds = 1,
      vocabSize = 6, maxPieceLen = 2, maxWordLen = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.keySet == Set("a", "b", "c", "d", "ab", "cd"),
      s"closed-form vocabulary mismatch: ${out.keySet}")
    assert(out("ab") == 8L, s"ab path count: ${out("ab")}")
    assert(out("cd") == 1L, s"cd path count: ${out("cd")}")
    assert(out("a") == 0L && out("d") == 0L,
      "characters off every Viterbi path carry count 0 and survive")
  }

  test("vocabSize truncates multi-char pieces; over-long words refuse " +
       "loudly at the maxWordLen bound") {
    import spark.implicits._
    val docs = Seq("abab abab abab ab ab cd").toDF("text")
    // budget 5 = 4 chars + ONE multi slot: ab (count 8) wins over cd
    val out = Unigram.train(docs, "text", seedMulti = 3, emRounds = 1,
      vocabSize = 5, maxPieceLen = 2, maxWordLen = 4)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("a", "b", "c", "d", "ab"),
      s"the vocab budget must keep the highest-count multi piece: $out")
    assert(scala.util.Try(Unigram.train(
      Seq("supercalifragilistic").toDF("text"), "text",
      seedMulti = 3, emRounds = 1, vocabSize = 5)).isFailure,
      "a word beyond maxWordLen must refuse loudly")
  }

  test("encode segments under the FINAL vocabulary: per-document " +
       "word/subword counts in exact fixed point") {
    import spark.implicits._
    // same fixture: abab = ab|ab (2 pieces), ab = ab (1), cd = cd (1)
    // -> 6 words, 3*2 + 2*1 + 1 = 9 subwords, ppm = 9e6 div 6
    val out = Unigram.encode(
      Seq((7L, "abab abab abab ab ab cd")).toDF("doc_id", "text"),
      "doc_id", "text", seedMulti = 3, emRounds = 1, vocabSize = 6,
      maxPieceLen = 2, maxWordLen = 4).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_subwords") == 9L,
      s"closed-form subword count mismatch: ${r.mkString(",")}")
    assert(r.getAs[Long]("subwords_per_word_ppm") == 1500000L)
  }
}
