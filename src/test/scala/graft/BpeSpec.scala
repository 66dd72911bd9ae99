package graft

import graft.ext.Bpe

/** BPE merge-induction laws: argmax + tie-break, greedy non-overlap on
  * same-symbol runs, multi-round composition, quote safety.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] =
    Bpe.learnMerges(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", rounds)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("learnMerges: hand-derived 6-round trace with count-desc/pair-asc ties") {
    // words: the*3, cat, hat, bat, small, tall
    val got = merges(Seq("the cat the hat", "the bat", "small tall"), 6)
    // r1: (a,t)=(h,e)=(t,h)=3 -> pair-asc: (a,t); r2: (h,e); r3: (t,he)=3
    // r4: (a,l)=2 (small,tall); r5: (al,l)=2; r6: 1-count ties -> (b,at)
    assert(got == Seq(
      (1, "a", "t", 3L), (2, "h", "e", 3L), (3, "t", "he", 3L),
      (4, "a", "l", 2L), (5, "al", "l", 2L), (6, "b", "at", 1L)))
  }

  test("learnMerges: greedy non-overlap selects alternate hits in a run") {
    // 'aaaa' = a,a,a,a: three (a,a) positions, greedy merges 0 and 2
    // -> [aa, aa]; round 2 must see exactly one (aa,aa) pair
    val got = merges(Seq("aaaa"), 2)
    assert(got == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("learnMerges: apostrophe symbols survive literal interpolation") {
    // all four pairs tie at 3; ASCII ' sorts before letters, so the
    // QUOTE pair wins round 1 — and its merged symbol "'t" is then
    // interpolated back into the round-2 expression (the escape path)
    val got = merges(Seq("don't don't don't"), 2)
    assert(got == Seq((1, "'", "t", 3L), (2, "d", "o", 3L)))
  }

  test("encode: per-doc subword counts under the trained merges") {
    // corpus: the*3, cat, hat, bat, small, tall — after the 6 traced
    // merges: the=[the](1), cat=[c,at](2), hat=[h,at](2), bat=[bat]…
    // bat: b,a,t -> r1 (a,t): [b,at] -> r6 (b,at): [bat](1)
    // small: s,m,a,l,l -> r4 (a,l): [s,m,al,l] -> r5 (al,l): [s,m,all](3)
    // tall: t,a,l,l -> [t,al,l] -> [t,all](2)
    val docs = Seq((1L, "the cat the hat"), (2L, "the bat"), (3L, "small tall"))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", 6)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords")))).toMap
    assert(got === Map(
      1L -> ((4L, 1L + 2L + 1L + 2L)), // the cat the hat
      2L -> ((2L, 1L + 1L)),           // the bat
      3L -> ((2L, 3L + 2L))))          // small tall
  }

  test("learnMerges: rounds must be positive; empty corpus fails loudly") {
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(Seq((1L, "ab")).toDF("doc_id", "text"), "text", 0)
    }
    intercept[IllegalArgumentException] { // single-char words: no pairs
      merges(Seq("a b c"), 1)
    }
  }
}
