package graft

import org.apache.spark.sql.functions._
import graft.ext.{Bloom, Chunking, RangeJoin}

/** Unit tests for the round-8 analytics operators: binned range join
  * (vs a brute-force inequality join), chunking law, and the Bloom
  * filter's no-false-negatives / exact-after-verify guarantees.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // ---- RangeJoin ----------------------------------------------------

  private val intervals = Seq(
    // (id, lo, hi): multi-bin span, sub-bin span, bin-aligned, empty,
    // inverted, adjacent-touching
    (1L, 100L, 1350L), // spans bins 0..2 at width 500
    (2L, 710L, 730L),  // inside one bin
    (3L, 500L, 1000L), // exactly bin 1
    (4L, 42L, 42L),    // empty: matches nothing
    (5L, 900L, 800L),  // inverted: matches nothing
    (6L, 1350L, 1400L) // starts where interval 1 ends
  ).toDF("iid", "lo", "hi")

  private val points =
    (Seq(0L, 99L, 100L, 101L, 499L, 500L, 710L, 729L, 730L, 999L, 1000L,
      1349L, 1350L, 1399L, 1400L, 5000L)).toDF("p").withColumn("pid", col("p"))

  test("binnedIntervalJoin equals the brute-force inequality join") {
    for (width <- Seq(1L, 7L, 500L, 10000L)) {
      val got = RangeJoin
        .binnedIntervalJoin(points, "p", intervals, "lo", "hi", width)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = points.join(intervals,
          col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"width=$width")
      assert(want.nonEmpty) // the fixture must actually exercise matches
    }
  }

  test("binnedIntervalJoin bounds: lo inclusive, hi exclusive") {
    val got = RangeJoin
      .binnedIntervalJoin(points, "p", intervals.filter($"iid" === 1), "lo",
        "hi", 500L)
      .select("p").as[Long].collect().toSet
    assert(got.contains(100L) && got.contains(1349L))
    assert(!got.contains(99L) && !got.contains(1350L))
  }

  test("binnedIntervalJoin rejects overlapping column names") {
    intercept[IllegalArgumentException] {
      RangeJoin.binnedIntervalJoin(points, "p",
        intervals.withColumnRenamed("iid", "p"), "lo", "hi", 10L)
    }
  }

  // ---- Chunking ------------------------------------------------------

  test("chunk law: offsets, overlap, reconstruction") {
    val docs = Seq(
      (1L, "a" * 550),  // 4 chunks at 200/150: ceil((550-200)/150)+1
      (2L, "b" * 200),  // exactly one chunk
      (3L, "c" * 201),  // forces a second, 51-char chunk
      (4L, "short"),
      (5L, ""),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, "doc_id", "text", 200, 150)
      .as[(Long, Int, Int, String, Int)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }

    assert(out(1L).map(_._4.length).toSeq == Seq(200, 200, 200, 100))
    assert(out(1L).head._3 == 4)
    assert(out(2L).map(_._4.length).toSeq == Seq(200))
    assert(out(3L).map(_._4.length).toSeq == Seq(200, 51))
    assert(out(4L).map(_._4).toSeq == Seq("short"))
    assert(out(5L).map(_._4).toSeq == Seq(""))
    assert(!out.contains(6L)) // null text yields no rows

    // overlap law: chunk i+1 repeats the last (chunkSize-stride) chars
    val c1 = out(1L).map(_._4)
    assert(c1(0).drop(150) == c1(1).take(50))
    // reconstruction: stride-prefixes of all but the last + last chunk
    val rebuilt = c1.dropRight(1).map(_.take(150)).mkString + c1.last
    assert(rebuilt == "a" * 550)
  }

  test("chunk rejects bad params and colliding names") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(docs, "doc_id", "text", 100, 101))
    intercept[IllegalArgumentException](Chunking.chunk(docs, "doc_id", "text", 0, 0))
    intercept[IllegalArgumentException](
      Chunking.chunk(docs.withColumnRenamed("text", "chunk_text"),
        "doc_id", "chunk_text", 100, 50))
  }

  // ---- Bloom ---------------------------------------------------------

  test("bloom: no false negatives; prefilter+verify equals the semi-join") {
    val universe = (0 until 400).map(i => s"key_$i").toDF("k")
    val members = universe.filter(md5(col("k").cast("binary")).startsWith("0"))
    val bloom = Bloom.build(members, col("k"), 1024, 5)

    // every member passes the prefilter (no false negatives)
    val missed = members.filter(!bloom.mightContain(col("k"))).count()
    assert(missed == 0)

    // prefilter + exact verify == plain semi-join
    val got = universe.filter(bloom.mightContain(col("k")))
      .join(members, Seq("k"), "left_semi").as[String].collect().sorted.toSeq
    val want = universe.join(members, Seq("k"), "left_semi")
      .as[String].collect().sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("bloom: prefilter passes a superset with a sane false-positive rate") {
    val universe = (0 until 2000).map(i => s"u_$i").toDF("k")
    val members = (0 until 100).map(i => s"u_$i").toDF("k")
    val bloom = Bloom.build(members, col("k"), 2048, 5) // ~20 bits/key
    val passed = universe.filter(bloom.mightContain(col("k"))).count()
    assert(passed >= 100)         // superset
    assert(passed <= 100 + 190)   // <10% FP on the 1900 non-members
  }

  test("bloom rejects bad sizing") {
    val keys = Seq("a").toDF("k")
    intercept[IllegalArgumentException](Bloom.build(keys, col("k"), 100, 5))
    intercept[IllegalArgumentException](Bloom.build(keys, col("k"), 64, 0))
  }
}
