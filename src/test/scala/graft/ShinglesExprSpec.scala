package graft

import org.apache.spark.sql.functions._
import graft.ext.TextHash
import graft.plans.ShinglesExpr

/** The native shingle expression must reproduce the zip_with-chain
  * composition exactly — gram content, first-occurrence dedup ORDER,
  * short-doc and null edges — or every shingle-derived oracle hash
  * (q22–q26, q44, q55) diverges.
  */
class ShinglesExprSpec extends SparkSpec {
  import spark.implicits._

  /** The previous composition, verbatim. */
  private def hofShingles(toks: org.apache.spark.sql.Column, n: Int) = {
    val grams = (1 until n).foldLeft(toks) { (acc, o) =>
      zip_with(acc, slice(toks, lit(o + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(
      when(size(toks) >= n, slice(grams, lit(1), size(toks) - (n - 1)))
        .otherwise(array().cast("array<string>")))
  }

  test("parity with the HOF composition on the documents testdata") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.01")
    for (n <- Seq(1, 2, 3, 5)) {
      val cmp = docs.select(
        ShinglesExpr.shingles(TextHash.tokens(col("text")), n).as("nat"),
        hofShingles(TextHash.tokens(col("text")), n).as("hof"))
        .filter(not(col("nat") === col("hof")))
      assert(cmp.isEmpty, s"shingle mismatch at n=$n")
    }
  }

  test("shinglesAll: full positional multiset — duplicates, order, edges") {
    // the non-distinct mode must emit every positional gram in order
    val got = Seq(
      (1L, "a b c a b c a b"), // 6 trigrams, repeats preserved
      (2L, "x y"),             // short → empty
      (3L, "p q r"))           // exactly one
      .toDF("id", "text")
      .select(col("id"),
        ShinglesExpr.shinglesAll(TextHash.tokens(col("text")), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("a b c", "b c a", "c a b", "a b c", "b c a", "c a b"))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq("p q r"))
    // null token array → empty, never null (matches the distinct mode)
    val n = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
      .select(ShinglesExpr.shinglesAll(col("toks"), 3).as("g"))
      .collect().head
    assert(n.getSeq[String](0) === Seq.empty)
  }

  test("hash60Array: identical to the transform+conv(md5) lambda form") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.01")
    val sh = TextHash.shingles(TextHash.tokens(col("text")), 3)
    val cmp = docs.select(
      graft.plans.Hash60ArrayExpr.hash60Array(sh).as("nat"),
      transform(sh, s => TextHash.hash60(s)).as("hof"))
      .filter(not(col("nat") === col("hof")))
    assert(cmp.isEmpty)
    // null element mirror
    val withNull = Seq(Seq(Some("a b c"), None)).toDF("arr")
      .select(graft.plans.Hash60ArrayExpr.hash60Array(col("arr")).as("nat"),
        transform(col("arr"), s => TextHash.hash60(s)).as("hof"))
      .collect().head
    assert(withNull.getSeq[Any](0) === withNull.getSeq[Any](1))
    assert(withNull.getSeq[Any](0)(1) === null)
  }

  test("edges: short docs, repeats keep first occurrence, null tokens") {
    val df = Seq(
      (1L, "a b c d"),       // 2 trigrams in positional order
      (2L, "a b"),           // shorter than n -> empty
      (3L, "x y x y x y x"), // repeated grams -> first occurrence kept
      (4L, "")).toDF("id", "t")
    val got = df.select(col("id"),
      ShinglesExpr.shingles(TextHash.tokens(col("t")), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("a b c", "b c d"))
    assert(got(2L) === Seq())
    assert(got(3L) === Seq("x y x", "y x y"))
    assert(got(4L) === Seq())
    // null token array -> empty, never null (the composition's `when`
    // guard routes the null condition to the empty branch)
    val nulls = Seq((1L, Option.empty[Seq[String]]))
      .toDF("id", "toks")
      .select(ShinglesExpr.shingles(col("toks"), 3).as("sh"),
        hofShingles(col("toks"), 3).as("hof"))
      .collect().head
    assert(nulls.getSeq[String](0) === Seq())
    assert(nulls.getSeq[String](1) === Seq())
  }
}
