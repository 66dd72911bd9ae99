package graft

import org.apache.spark.sql.functions._
import graft.ext.{Cohorts, LangModel}

/** Laws for the trigram-LM scorer and the cohort retention matrix. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("scoreByTrigramLm: counts and fixed-point scores on a known corpus") {
    // "aaaa" → trigrams aaa, aaa; "aaab" → aaa, aab; "ab" → none (dropped)
    val docs = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "ab"))
      .toDF("doc_id", "text")
    val got = LangModel.scoreByTrigramLm(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // model: aaa×3, aab×1, total 4
    val lpAaa = math.round(math.log(3.0 / 4.0) * 1e6) // -287682
    val lpAab = math.round(math.log(1.0 / 4.0) * 1e6) // -1386294
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((2L, 2 * lpAaa, (2.0 * lpAaa) / 2.0)))
    assert(got(2L) == ((2L, lpAaa + lpAab, (lpAaa + lpAab) / 2.0)))
  }

  test("scoreByTrigramLm: gibberish scores below corpus-typical text") {
    // 40 near-identical English-ish docs + 1 unique-charset doc: the
    // model-based filter must rank the outlier lowest
    val docs = ((1L to 40L).map(i => (i, s"the quick brown fox number $i"))
      :+ (99L, "zzqxv jjkkw pqzzt")).toDF("doc_id", "text")
    val scores = LangModel.scoreByTrigramLm(docs, "doc_id", "text")
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    val worst = scores.minBy(_._2)._1
    assert(worst == 99L, s"outlier must score lowest; got $scores")
  }

  test("retention: cohort matrix on a two-week fixture") {
    // Mondays (UTC): 2024-01-01 and 2024-01-08
    val w0 = 1704067200000000L // 2024-01-01T00:00Z in micros
    val day = 86400000000L
    val ev = Seq(
      (1L, w0 + day),          // user 1 first in week 0
      (1L, w0 + 7 * day),      // …active week 1
      (2L, w0 + 2 * day),      // user 2 only week 0
      (3L, w0 + 8 * day)       // user 3 first in week 1
    ).toDF("user_id", "us").select(col("user_id"),
      timestamp_micros(col("us")).as("ts"))
    val got = Cohorts.retention(ev, "user_id", "ts")
      .select(unix_micros(col("cohort_week")).as("w"), col("week_offset"),
        col("n_users"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set(
      (w0, 0, 2L),           // users 1,2 in their cohort week
      (w0, 1, 1L),           // user 1 retained one week later
      (w0 + 7 * day, 0, 1L)  // user 3's cohort
    ))
  }
}
