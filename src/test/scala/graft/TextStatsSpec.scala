package graft

import graft.ext.{TextHash, TextStats}

/** Text profiling: counts, ratios, language guess, rolling fingerprint
  * (hand-computed twin of the Column expression).
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, stopword ratio, language guess") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "der Hund und die Katze ist zu Hause"),
      (3L, "xyzzy plugh")) // no stopwords from any set → "und"(etermined)
      .toDF("doc_id", "text")
    val got = TextStats.profile(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_chars") === 22L)
    assert(r1.getAs[Long]("n_tokens") === 6L)
    // tokens: the,cat,sat,on,the,mat → "the"×2 in the en set → 2/6
    assert(math.abs(r1.getAs[Double]("stopword_ratio") - 2.0 / 6.0) < 1e-15)
    assert(r1.getAs[String]("lang_guess") === "en")
    assert(got(2L).getAs[String]("lang_guess") === "de")
    assert(got(3L).getAs[String]("lang_guess") === "und")
  }

  test("BPE-ish token count: letter runs, single digits, punct runs") {
    val got = Seq((1L, "don't split 42 ... ok?!"))
      .toDF("doc_id", "text")
    val r = TextStats.profile(got, "doc_id", "text").collect()(0)
    // don | ' | t | split | 4 | 2 | ... | ok | ?! → 9; whitespace → 5
    assert(r.getAs[Long]("n_bpe_tokens") === 9L)
    assert(r.getAs[Long]("n_tokens") === 5L)
  }

  test("rollingFingerprint matches a driver-side reimplementation") {
    val s = "spark engine 42"
    val expected = s.foldLeft(0L)((acc, ch) => (acc * 31L + ch.toLong) % TextHash.FpMod)
    val got = Seq((1L, s)).toDF("doc_id", "text")
      .select(TextHash.rollingFingerprint($"text").as("f"))
      .collect()(0).getAs[Long]("f")
    assert(got === expected)
  }

  test("quality score: bounded in [0,1] on the documents testdata") {
    val prof = TextStats.profile(
      graft.queries.Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text")
    val bad = prof.filter($"quality" < 0.0 || $"quality" > 1.0).count()
    assert(bad === 0L)
  }
}
