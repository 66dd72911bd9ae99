package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Interleave

/** Stride interleave (q139): the bucketed rank kernel must equal the
  * window-function form exactly at every bucket width, and the order it
  * produces must carry the weighted mixture in EVERY prefix — the
  * property stride scheduling exists for.
  */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Map("a" -> 3L, "b" -> 2L, "c" -> 1L) // lcm 6

  // ids deliberately non-contiguous and interleaved across groups
  private def docs(n: Int) = (0 until n)
    .map(i => (i * 7L + (i % 5), Seq("a", "b", "c")(i % 3)))
    .toDF("id", "g")

  test("bucketedGroupRank equals row_number at every bucket width") {
    val df = docs(300)
    val want = df.withColumn("r",
        row_number().over(Window.partitionBy("g").orderBy("id")).cast("long"))
      .as[(Long, String, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 64L, 100000L)) {
      val got = Interleave
        .bucketedGroupRank(df, Seq("g"), col("id"), w, Seq(col("id")), "r")
        .select("id", "g", "r").as[(Long, String, Long)].collect().toSet
      assert(got == want, s"width=$w")
    }
  }

  test("bucketedGroupRank with no groups equals the global row_number") {
    val df = docs(300)
    val want = df.withColumn("r",
        row_number().over(Window.orderBy("id")).cast("long"))
      .as[(Long, String, Long)].collect().toSet
    val got = Interleave
      .bucketedGroupRank(df, Nil, col("id"), 64L, Seq(col("id")), "r")
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("strideOrder: every prefix carries the weighted mixture") {
    // 900 docs, 300 per group. Group a (w=3) exhausts its supply first,
    // at roughly slot 600 of the order; the stride guarantee holds
    // while all sources have supply, so assert prefixes up to 550.
    val order = Interleave.strideOrder(docs(900), "id", "g", weights)
      .orderBy("seq").select("g").as[String].collect()
    assert(order.length == 900)
    val counts = collection.mutable.Map("a" -> 0L, "b" -> 0L, "c" -> 0L)
    val wsum = weights.values.sum.toDouble
    order.take(550).zipWithIndex.foreach { case (g, idx) =>
      counts(g) += 1
      val p = idx + 1
      for ((grp, w) <- weights) {
        val expect = p * w / wsum
        assert(math.abs(counts(grp) - expect) <= 2.0,
          s"prefix $p: group $grp has ${counts(grp)}, expected ~$expect")
      }
    }
    // seq is a dense 1..n permutation
    val seqs = Interleave.strideOrder(docs(900), "id", "g", weights)
      .select("seq").as[Long].collect().sorted
    assert(seqs.toSeq == (1L to 900L))
  }

  test("strideOrder fails loudly on a group value outside the weight map") {
    val df = Seq((1L, "a"), (2L, "zz")).toDF("id", "g")
    val e = intercept[Exception] {
      Interleave.strideOrder(df, "id", "g", weights).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("outside the weight map")))
  }

  test("strideOrder reserves its output/working column names loudly") {
    val df = Seq((1L, "a", 9L)).toDF("id", "g", "vt")
    val e = intercept[IllegalArgumentException] {
      Interleave.strideOrder(df, "id", "g", weights)
    }
    assert(e.getMessage.contains("strideOrder reserves"))
  }

  test("bucketedGroupRank reserves its working column names loudly") {
    val bad = docs(10).withColumnRenamed("g", "_rk_bucket")
    val e = intercept[IllegalArgumentException] {
      Interleave.bucketedGroupRank(bad, Seq("_rk_bucket"), col("id"), 4L,
        Seq(col("id")), "r")
    }
    assert(e.getMessage.contains("_rk_bucket"))
  }
}
