package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: writes the round-20 before/after formatted plans for the
  * plan-visible optimizations to plans/r20/. The "before" plans are the
  * previous round's exact expression shapes, reconstructed inline and
  * labeled; the "after" plans come from the current code paths. Most
  * r20 changes live in eagerly-executed imperative sections (checkpoint
  * sharing, write overlap, stream state sizing) whose evidence is the
  * code + measured seconds, not a final-frame plan — this dumps the
  * subset where the physical plan itself is the claim.
  */
object PlanDumps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r20")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tuning.localIo(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    new java.io.File(outDir).mkdirs()

    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode) // logical too
      val fmt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), fmt + "\n")
      println(s"[plans] wrote $outDir/$name.txt (${fmt.count(_ == '\n')} lines)")
      val _ = plan
    }

    // ---- q142 k-core peel round: survivor joins ----
    {
      val li = graft.queries.Tables.lineitem(s, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      // BEFORE (r19): lineitem equi-self-join pair build
      val pairsBefore = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      dump("q142_pairs_before", pairsBefore)
      // AFTER: posting-list combination build
      val pairsAfter = li
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .filter(size(col("ps")) > 1)
        .select(explode(flatten(transform(col("ps"), (a, i) =>
          transform(slice(col("ps"), i + lit(2), size(col("ps"))),
            b => struct(a.as("u"), b.as("v")))))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
      dump("q142_pairs_after", pairsAfter)

      val und = pairsAfter.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val sym = und.union(und.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint()
      val keepPlain = sym.groupBy(col("u").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 80).select(col("id"))
      // BEFORE (r19): un-hinted survivor joins (sort-merge, edge set
      // shuffled twice per round)
      dump("q142_peel_round_before", sym
        .join(keepPlain.withColumnRenamed("id", "u"), Seq("u"))
        .join(keepPlain.withColumnRenamed("id", "v"), Seq("v"))
        .select(col("u"), col("v")))
      // AFTER: broadcast survivor set — no exchange on the edge set
      val keepB = broadcast(keepPlain)
      dump("q142_peel_round_after", sym
        .join(keepB.withColumnRenamed("id", "u"), Seq("u"))
        .join(keepB.withColumnRenamed("id", "v"), Seq("v"))
        .select(col("u"), col("v")))

      // ---- q158 BFS frontier round ----
      val levels0 = s.range(1)
        .select(lit(0L).as("id"), lit(0).cast("int").as("lvl"))
        .localCheckpoint()
      val frontier = levels0.select("id")
      dump("q158_frontier_before", sym
        .join(frontier.withColumnRenamed("id", "u"), "u")
        .select(col("v").as("id")).distinct()
        .join(levels0, Seq("id"), "left_anti")
        .select(col("id"), lit(1).cast("int").as("lvl")))
      dump("q158_frontier_after", sym
        .join(broadcast(frontier.withColumnRenamed("id", "u")), "u")
        .select(col("v").as("id")).distinct()
        .join(broadcast(levels0), Seq("id"), "left_anti")
        .select(col("id"), lit(1).cast("int").as("lvl")))
    }

    // ---- q176 LSH recall audit: shared index vs triple rebuild ----
    {
      import graft.ext.Dedup
      val docs = graft.queries.Tables.documents(s, sfDir)
      val n = 3            // ExtQueries.ShingleN
      val nh = 16          // ExtQueries.NumHashes
      val thr = 0.5        // ExtQueries.JaccardThreshold
      val bands = 4        // ExtQueries.Bands
      // BEFORE (r19): truth + each banding config rebuilt fingerprints
      // and signatures from the raw text (three fingerprint subtrees,
      // two signature aggregations — visible as repeated scans of
      // documents.parquet in one plan)
      val truthBefore = Dedup.jaccardPairs(docs, "doc_id", "text", n, thr)
      def missBefore(b: Int, tag: String) =
        truthBefore.join(
          Dedup.minhashLshPairs(docs, "doc_id", "text", n, nh, b, thr)
            .select("id_a", "id_b"),
          Seq("id_a", "id_b"), "left_anti").withColumn("config", lit(tag))
      dump("q176_before",
        missBefore(bands, s"b$bands").unionByName(missBefore(1, "b1")))
      // AFTER: the registered query (one fingerprint checkpoint, one
      // signature checkpoint — the plan scans ExistingRDDs)
      dump("q176_after",
        graft.SparkEntry.queries("q176_lsh_recall_audit")(s, sfDir))
    }

    // ---- q128 retraction semi-join: broadcast the delta PK side ----
    {
      import graft.transform.Financials
      import graft.ingest.RawZoneGen
      val syms = RawZoneGen.symbolCount(RawZoneGen.sfOf(sfDir))
      val raw = s.read.parquet(RawZoneGen.stagedPath(s, syms))
      val day0 = raw.filter(col("load_date") === lit("2025-08-14"))
      val day1 = raw.filter(col("load_date") === lit("2025-08-15"))
      val factPath = graft.sources.Sinks.tmpPath(s"plan_fact_$syms")
      graft.sources.Sinks.deleteRecursively(factPath)
      Financials.normalizeInto(day0, factPath)
      val dayFacts = Financials.normalize(day1)
        .withColumn("bucket", graft.sources.Sinks.factBucket(32))
        .localCheckpoint()
      val touched = dayFacts.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toIndexedSeq
      val existing = s.read.parquet(factPath)
        .filter(col("bucket").isin(touched: _*))
      dump("q128_retraction_before", existing
        .join(dayFacts.select(Financials.Pk.map(col): _*),
          Financials.Pk, "left_semi"))
      dump("q128_retraction_after", existing
        .join(broadcast(dayFacts.select(Financials.Pk.map(col): _*)),
          Financials.Pk, "left_semi"))
    }

    // ---- q261 snapshot equality: two exceptAll passes vs one signed
    //      union aggregate ----
    {
      val a = graft.queries.Tables.orders(s, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val b = graft.queries.Tables.orders(s, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      dump("q261_equality_before_except1", a.exceptAll(b))
      val diff = a.withColumn("_s", lit(1L))
        .unionByName(b.withColumn("_s", lit(-1L)))
        .groupBy(a.columns.map(col): _*)
        .agg(sum(col("_s")).as("_d"))
        .filter(col("_d") =!= 0L)
      dump("q261_equality_after", diff)
    }

    // ---- q263/q264 unigram Viterbi: position-unrolled DP (17
    //      checkpoint jobs per pass) vs one-job composition
    //      enumeration. The before plan's leaves are the per-step
    //      ExistingRDD checkpoints — the job count IS the claim; the
    //      after plan is one self-contained join+argmax tree. ----
    {
      import graft.ext.TextHash.tokens
      val docs = graft.queries.Tables.documents(s, sfDir)
      val maxPieceLen = 4
      val maxWordLen = 8
      val words = docs.select(explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .localCheckpoint()
      val cands = words.select(col("w"), col("freq"),
          explode(expr(
            s"""flatten(transform(sequence(0, length(w) - 1), i ->
               |  transform(sequence(i + 1,
               |      least(length(w), i + $maxPieceLen)), j ->
               |    struct(i AS i, j AS j,
               |      substring(w, i + 1, j - i) AS piece))))""".stripMargin))
            .as("c"))
        .select(col("w"), col("c.i").as("i"), col("c.j").as("j"),
          col("c.piece").as("piece"))
        .localCheckpoint()
      // stand-in seed scores (plan shape is score-value independent)
      val vocab = cands.groupBy("piece").agg(count(lit(1)).as("cnt"))
        .withColumn("sc",
          round(log(col("cnt") + lit(1.0)) * lit(-1e6)).cast("long"))
        .select(col("piece"), col("sc"))
      val edges = cands.join(vocab, "piece")
        .select(col("w"), col("i"), col("j"), col("piece"), col("sc"))
        .localCheckpoint()
      // BEFORE (r19): the unrolled forward DP + backtrack — one eager
      // localCheckpoint per position step, per direction
      var best = words.select(col("w"), lit(0).as("pos"), lit(0L).as("best"))
        .localCheckpoint()
      for (j <- 1 to maxWordLen) {
        val bj = edges.filter(col("j") === j).as("e")
          .join(best.as("b"),
            col("e.w") === col("b.w") && col("b.pos") === col("e.i"))
          .groupBy(col("e.w").as("w"))
          .agg(max(col("b.best") + col("e.sc")).as("best"))
          .select(col("w"), lit(j).as("pos"), col("best"))
        best = best.unionByName(bj).localCheckpoint()
      }
      val succ = edges.as("e")
        .join(best.as("b"),
          col("e.w") === col("b.w") && col("b.pos") === col("e.i"))
        .groupBy(col("e.w").as("w"), col("e.j").as("j"))
        .agg(min(struct((-(col("b.best") + col("e.sc"))).as("nscore"),
          col("e.i").as("pos"), col("e.piece").as("piece"))).as("m"))
        .select(col("w"), col("j"), col("m.pos").as("pos"),
          col("m.piece").as("piece"))
        .localCheckpoint()
      var cursor = words.select(col("w"), length(col("w")).as("pos"))
      var picks: DataFrame = null
      for (_ <- 1 to maxWordLen) {
        val step = cursor.filter(col("pos") > 0).as("c")
          .join(succ.as("s"),
            col("s.w") === col("c.w") && col("s.j") === col("c.pos"))
          .select(col("c.w").as("w"), col("s.piece").as("piece"),
            col("s.pos").as("pos"))
          .localCheckpoint()
        picks = if (picks == null) step else picks.unionByName(step)
        cursor = step.select(col("w"), col("pos"))
      }
      dump("q264_viterbi_before", picks)
      // AFTER: the real code path — one bounded composition join +
      // argmax, no per-step materialization
      dump("q264_viterbi_after",
        graft.ext.Unigram.viterbiPicks(words, edges, maxWordLen,
          maxPieceLen))
    }

    spark.stop()
  }
}
