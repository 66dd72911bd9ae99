package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextHash}

/** Dedup operator pack: exact groups, shingles, exact Jaccard, banded
  * MinHash-LSH recall on planted near-dups, SimHash stability.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog today"),
    (2L, "the  QUICK   brown fox jumps over the lazy dog today"), // exact dup after normalize
    (3L, "The quick brown fox jumps over the lazy cat today"),    // near dup of 1
    (4L, "completely different text about spark catalyst engines here"),
    (5L, "ab"))                                                   // < n tokens → no shingles
    .toDF("doc_id", "text")

  test("exactGroups: normalized-content key groups case/space variants") {
    val got = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))
      .toSet
    assert(got.contains((1L, 2L))) // docs 1+2 collapse, canonical id 1
    assert(got.size === 4)         // 5 docs → 4 distinct contents
  }

  test("shingles: short docs yield empty set, no descending-sequence crash") {
    val sh = docs.select(col("doc_id"),
      TextHash.shingles(TextHash.tokens(col("text")), 3).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(sh(5L).isEmpty)
    assert(sh(1L).size === 8) // 10 tokens → 8 trigrams, all distinct
    assert(sh(1L).contains("The quick brown"))
  }

  test("jaccardPairs: hand-computed overlap, threshold filter") {
    // 10 tokens → 8 trigrams per doc. 1 vs 3 differ at token 9 → the 2
    // trigrams covering it differ → shared 6, jaccard 6/10. 1 vs 2
    // differ at tokens 1-2 (case) → same: 6/10. 2 vs 3 differ at both
    // sites → shared 4, jaccard 4/12 < 0.4 → filtered.
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(got === Set((1L, 2L, 0.6), (1L, 3L, 0.6)))
  }

  test("jaccardPairs: hot shared shingle generates no quadratic candidate blowup") {
    // 40 docs all containing the stop-trigram "the common filler" but
    // pairwise dissimilar (J ≈ 1/15 < τ), plus one planted near-dup
    // pair. Without prefix filtering the hot shingle alone emits
    // 40·39/2 = 780 candidate rows; with it, the hot shingle has
    // maximal document frequency, sorts last in the global order, and
    // falls outside every prefix.
    val hot = (0 until 40).map { i =>
      (100L + i, s"the common filler w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")
    }
    val planted = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (901L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
    val df = (hot ++ planted).toDF("doc_id", "text")

    val cands = Dedup.prefixCandidates(df, "doc_id", "text", 3, 0.5).count()
    // the only prefix collision is the planted pair (rare shingles)
    assert(cands < 10, s"candidate count $cands should be ≪ 780 (hot-key square)")

    // recall check: the planted pair (8 shared of 8∪9=9 → J=8/9) is found
    val got = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got === Set((900L, 901L)))
  }

  test("jaccardPairs: prefix filter loses no recall vs brute force") {
    // 20 docs built from a tiny vocabulary so many borderline pairs
    // exist; compare against a driver-side exact recompute.
    val vocab = Vector("red", "blue", "green", "fast", "slow", "car", "boat")
    val docs20 = (0 until 20).map { i =>
      val toks = (0 until 8).map(j => vocab((i * 3 + j * 5 + i * j) % vocab.size))
      (i.toLong, toks.mkString(" "))
    }
    val df = docs20.toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    // driver-side oracle: exact shingle sets + all-pairs Jaccard
    val sets = docs20.map { case (id, t) =>
      id -> t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toDouble
      j = inter / (sets(a).size + sets(b).size - inter)
      if j >= 0.3
    } yield (a, b, j)).toSet
    assert(got === want)
  }

  test("jaccardPairs: τ=0.9 containment pair at exactly J=τ is not lost") {
    // B's 11 tokens are a prefix of A's 12 → B's 9 shingles ⊂ A's 10,
    // J = 9/10 = 0.9 exactly. A's one extra shingle (df=1) is globally
    // rarest and occupies prefix rank 1; the pair is only found if A's
    // prefix ALSO reaches rank 2. (1−0.9)·10 = 0.9999999999999998 in
    // doubles, so a floor-based prefix length computes 1, not 2, and
    // silently drops the pair — this is the regression test for the
    // epsilon-guarded n−⌈τ·n⌉+1 form.
    val toks = (1 to 12).map(i => s"tok$i")
    val pair = Seq(
      (1L, toks.mkString(" ")),            // 12 tokens → 10 shingles
      (2L, toks.take(11).mkString(" ")))   // 11 tokens → 9 shingles
      .toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(pair, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(got === Set((1L, 2L, 0.9)))
  }

  test("minhashLshPairs: planted near-identical pair survives banding + verify") {
    val planted = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashLshPairs(planted, "doc_id", "text", 3, 16, 4, 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard")))
    assert(got.toSeq === Seq((10L, 11L, 1.0))) // identical → every band agrees
  }

  test("minhash signatures: identical docs get identical signatures") {
    val two = Seq((1L, "spark catalyst tungsten codegen shuffle exchange"),
      (2L, "spark catalyst tungsten codegen shuffle exchange"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(two, "doc_id", "text", 3, 8)
      .collect().map(r => (0 until 8).map(i => r.getAs[Long](s"h$i")))
    assert(sigs(0) === sigs(1))
  }

  test("simhashPairs: identical docs pair at hamming 0; unrelated docs don't pair") {
    val planted = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(planted, "doc_id", "text", 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming")))
    assert(got.toSeq === Seq((10L, 11L, 0)))
  }

  test("simhash: identical docs identical, 60-bit range") {
    val two = Seq((1L, "spark catalyst tungsten codegen shuffle exchange"),
      (2L, "spark catalyst tungsten codegen shuffle exchange"),
      (3L, "utterly different words entirely unrelated content stream"))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash(two, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
    assert(fp.values.forall(v => v >= 0L && v < (1L << 60)))
  }

  test("incrementalLshPairs: equals full recompute restricted to new-side pairs") {
    // planted corpus: 1≈2 (released×released — must NOT appear), 3≈4
    // (new×released), 6≈9 (new×new), 5 unrelated. % 3 == 0 is "new".
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine eleven"),
      (5L, "utterly unrelated content about catalyst plans and shuffles"),
      (6L, "red orange yellow green blue indigo violet ultra infra deep"),
      (9L, "red orange yellow green blue indigo violet ultra infra deep"))
      .toDF("doc_id", "text")
    val (bands, sets) = Dedup.lshIndexOf(
      corpus.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", 3, 16, 4)
    val inc = Dedup.incrementalLshPairs(
      corpus.filter(col("doc_id") % 3 === 0), "doc_id", "text",
      bands, sets, 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full.filter(p => p._1 % 3 == 0 || p._2 % 3 == 0))
    assert(inc.contains((6L, 9L)))         // new×new found
    assert(inc.exists(p => p == (3L, 4L))) // new×released found
    assert(!inc.contains((1L, 2L)))        // released×released excluded
  }

  test("repeatedSpans: cross-doc law, overlap+touch merge, no false hits") {
    // shared passage "a b c" (n=3) sits at positions 1 of doc 1 and
    // 4 of doc 2; doc 1 additionally repeats "x y z x y z" WITHIN
    // itself only — a within-doc repeat must NOT create a span (the
    // law is count(DISTINCT doc) >= 2). doc 3 shares nothing.
    val corpus = Seq(
      (1L, "a b c q x y z x y z"),      // hit gram "a b c" at i=1
      (2L, "p q r a b c d e"),          // hits at i=4 ("a b c"), i=5? no
      (3L, "m n o u v w k l"))
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("masked_tokens"), r.getAs[String]("spans"))).toSet
    assert(got === Set(
      (1L, 1L, 3L, "1-4"),
      (2L, 1L, 3L, "4-7")))

    // overlapping grams fuse into ONE span: docs share a 5-token run →
    // three overlapping 3-grams each, one merged [start, start+5) span
    val run = Seq(
      (10L, "s t u v w tail1 tail2"),
      (11L, "head0 s t u v w"))
      .toDF("doc_id", "text")
    val merged = Dedup.repeatedSpans(run, "doc_id", "text", 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("masked_tokens"), r.getAs[String]("spans"))).toSet
    assert(merged === Set(
      (10L, 1L, 5L, "1-6"),
      (11L, 1L, 5L, "2-7")))

    // touching (non-overlapping) duplicated regions also merge: doc 20
    // shares [1,4) with doc 21 and [4,7) with doc 22 — one span "1-7"
    val touch = Seq(
      (20L, "a1 a2 a3 b1 b2 b3"),
      (21L, "a1 a2 a3 z1 z2 z3"),
      (22L, "y1 y2 y3 b1 b2 b3"))
      .toDF("doc_id", "text")
    val t20 = Dedup.repeatedSpans(touch, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_spans"), r.getAs[String]("spans"))).toMap
    assert(t20(20L) === (1L, "1-7"))
    assert(t20(21L) === (1L, "1-4"))
    assert(t20(22L) === (1L, "4-7"))
  }
}
