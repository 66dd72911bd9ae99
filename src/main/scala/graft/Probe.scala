package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextHash._
import graft.queries.Tables

/** Local stage-timing probe for the shingle-hash query pack (not part of
  * the driver contract; dev aid to attribute bench seconds to pipeline
  * stages).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.localIo(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      // warmup then timed
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id").as("id"), tokens(col("text")).as("t"))
    val sh = docs.select(col("doc_id").as("id"),
      shingles(tokens(col("text")), 3).as("sh"))
    val rows = sh.filter(size(col("sh")) > 0)
      .select(col("id"), explode(col("sh")).as("shingle"))

    time("tokens")(toks)
    time("shingle arrays")(sh)
    time("exploded rows")(rows)
    time("exploded + md5")(rows.withColumn("h", md5Hex(col("shingle"))))
    time("exploded + hash60")(rows.withColumn("h", hash60(col("shingle"))))
    time("exploded + hash60 % P")(rows.withColumn("x", hash60(col("shingle")) % P))
    val withX = rows.withColumn("x", hash60(col("shingle")) % P)
    val mins16 = minhashPerms(16).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("x") + lit(b)) % P).as(s"h$i")
    }
    time("groupBy 16 mins")(withX.groupBy(col("id")).agg(mins16.head, mins16.tail: _*))
    val withH = rows.withColumn("h", hash60(col("shingle")))
    val votes = (0 until 60).map { j =>
      sum(when(expr(s"shiftright(h, $j) & 1") === 1, 1L).otherwise(-1L)).as(s"v$j")
    }
    time("groupBy 60 votes")(withH.groupBy(col("id")).agg(votes.head, votes.tail: _*))

    // q38/q39 stage attribution
    import graft.ingest.RawZoneGen
    import graft.sources.Sinks
    import graft.transform.{Financials, Summary}
    val n = RawZoneGen.symbolCount(RawZoneGen.sfOf(sfDir))
    val gen = RawZoneGen.payloads(spark, n)
    time(s"gen payloads n=$n")(gen)
    val rawPath = Sinks.tmpPath(s"probe_raw_$n")
    val t0 = System.nanoTime()
    Sinks.writeRawZone(gen, rawPath)
    println(f"[probe] ${"writeRawZone"}%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    val raw = spark.read.parquet(rawPath)
    time("normalize (G1 unpivot)")(Financials.normalize(raw))
    val factPath = Sinks.tmpPath(s"probe_fact_$n")
    val t1 = System.nanoTime()
    Sinks.writeFact(Financials.normalize(raw), factPath)
    println(f"[probe] ${"writeFact"}%-32s ${(System.nanoTime() - t1) / 1e9}%8.2f s")
    time("summary over staged raw")(Summary.normalize(raw).drop("updated_at"))
    time("summary over live gen")(Summary.normalize(gen).drop("updated_at"))

    // q25 stage attribution
    import graft.ext.Dedup
    val shSets = docs.select(col("doc_id").as("id"),
      shingles(tokens(col("text")), 3).as("sh")).filter(size(col("sh")) > 0)
    time("q25 shingle sets")(shSets)
    time("q25 prefix candidates")(Dedup.prefixCandidates(docs, "doc_id", "text", 3, 0.5))
    time("q25 full")(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5))

    // raw-zone write experiment: codec × dictionary encoding
    for {
      codec <- Seq("zstd", "snappy")
      dict <- Seq("true", "false")
    } {
      val p = Sinks.tmpPath(s"probe_w_${codec}_$dict")
      val t = System.nanoTime()
      gen.withColumn("load_date", to_date(col("loaded_at")))
        .write.mode("overwrite").option("compression", codec)
        .option("parquet.enable.dictionary", dict)
        .partitionBy("load_date").parquet(p)
      println(f"[probe] write $codec dict=$dict%-14s ${(System.nanoTime() - t) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
