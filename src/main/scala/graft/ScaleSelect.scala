package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Selection

/** Scale-evidence harness for the exact-selection kernel
  * (ext/Selection.exactKths, backing q125's median, q163's equi-depth
  * histogram, and q164's MAD screen): the claim under test is that
  * histogram-refinement selection finds EXACT quantiles in a fixed,
  * data-independent number of counting scans with ZERO row movement
  * (shuffle volume = groups × quantiles × buckets per round), while
  * the window-sort form (`row_number() = k`) range-shuffles every row
  * and concentrates each group in one sort task — the global-median
  * case is ONE task sorting the entire input. Both forms run over the
  * same law-generated rows and their boundary values are compared for
  * equality, so the speedup is measured on provably identical results.
  *
  * Value law: v = (id · 2654435761) mod 10⁹ — Knuth multiplicative
  * hash, deterministic, ~uniform over a ppm-scale domain (resolves in
  * ⌈log₁₀₂₄ 10⁹⌉ = 3 refinement rounds); group = id mod G.
  *
  * Measured (local[32], 8 boundaries/group): at 20M rows the kernel
  * runs 13.6 s vs the window's 53.7 s global (4.0×) and 8.0 vs 11.6 s
  * at G=4; at 60M rows 32.3 s vs 229.6 s global (7.1×) and 28.8 vs
  * 57.9 s at G=4 (2.0×); at 120M rows 47.4 s vs 417.6 s global
  * (8.8×) and 47.0 vs 92.4 s at G=4 (2.0×). The global gap WIDENS
  * monotonically with scale (4.0× → 7.1× → 8.8×) — the window form's
  * cost is one task sorting the entire input, so it degrades
  * superlinearly while the kernel's counting scans stay
  * embarrassingly parallel. Boundaries asserted identical every run.
  *
  * Usage: runMain graft.ScaleSelect [nRows] — prints per-(G, form)
  * seconds and asserts boundary equality.
  */
object ScaleSelect {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val B = 8 // equi-depth buckets, the q163 shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.localIo(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Map[(String, Int), Long]): Map[(String, Int), Long] = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleselect] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (${r.size} boundaries)")
      r
    }

    val ks: Seq[Long => Long] =
      (1 to B).map(i => (nn: Long) => (i * nn + B - 1) / B)

    for (groups <- Seq(1, 4)) {
      val rows = spark.range(n).select(
        pmod(col("id") * 2654435761L, lit(1000000000L)).as("v"),
        pmod(col("id"), lit(groups.toLong)).cast("string").as("g"))

      val kernel = timed(s"kernel   G=$groups")(
        Selection.exactKths(rows, "g", "v", ks)
          .collect()
          .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap)

      // the hostile form: full range-shuffle sort, one task per group
      val windowed = timed(s"window   G=$groups") {
        rows.createOrReplaceTempView("t")
        spark.sql(
          s"""SELECT g, i, v FROM (
             |  SELECT g, v,
             |    row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
             |    count(*) OVER (PARTITION BY g) AS n
             |  FROM t) r
             |JOIN (SELECT explode(sequence(1, $B)) AS i)
             |  ON rn = (i * n + ${B - 1}) div $B""".stripMargin)
          .collect()
          .map(r => (r.getString(0), r.getInt(1) - 1) -> r.getLong(2)).toMap
      }
      require(kernel == windowed,
        s"boundary mismatch at G=$groups: kernel=$kernel window=$windowed")
      println(s"[scaleselect] G=$groups boundaries agree (${kernel.size})")
    }
    println(s"[scaleselect] done n=$n B=$B")
    spark.stop()
  }
}
