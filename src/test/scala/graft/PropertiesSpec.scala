package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Functions
import graft.transform.Upsert

/** Property tests (SURVEY.md §5.2): upsert idempotence, dedup
  * order-invariance, market-cap parse law. Generated with fixed seeds —
  * deterministic like every other suite.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def rowsGen: Gen[List[(String, Int, Double)]] =
    Gen.listOfN(40, for {
      k <- Gen.oneOf("a", "b", "c", "d", "e")
      v <- Gen.choose(0, 5)
      x <- Gen.choose(0, 999)
    } yield (k, v, x / 4.0))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Unique `ver` per row (v·1000 + index) → the per-key winner is
    * unique on each side, so results are fully deterministic; cross-side
    * ver collisions stay possible and are resolved by the incoming-wins
    * generation tag.
    */
  private def uniqueVer(rows: List[(String, Int, Double)]): List[(String, Int, Double)] =
    rows.zipWithIndex.map { case ((k, v, x), i) => (k, v * 1000 + i, x) }

  test("upsert idempotence: upsert(upsert(e, i), i) == upsert(e, i)") {
    for (seed <- 1 to 5) {
      val e = uniqueVer(sample(rowsGen, seed)).toDF("k", "ver", "x")
      val i = uniqueVer(sample(rowsGen, seed + 100)).toDF("k", "ver", "x")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
      val once = Upsert.upsert(e, i, Seq("k"), col("ver"))
      val twice = Upsert.upsert(once, i, Seq("k"), col("ver"))
      assert(canon(twice) === canon(once), s"seed=$seed")
      // and exactly one row per key survives
      assert(once.select("k").distinct().count() === once.count(), s"seed=$seed")
    }
  }

  test("latestByKey is input-order invariant (deterministic under shuffle)") {
    for (seed <- 1 to 5) {
      val base = uniqueVer(sample(rowsGen, seed))
      def run(rows: List[(String, Int, Double)]) =
        Upsert.latestByKey(rows.toDF("k", "ver", "x").repartition(7), Seq("k"),
          col("ver"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
      assert(run(base) === run(scala.util.Random.javaRandomToRandom(
        new java.util.Random(seed)).shuffle(base)), s"seed=$seed")
    }
  }

  test("market-cap parse law: parse(format(v, suffix)) == v * multiplier") {
    val cases = for {
      n <- Seq("0.5", "1", "42", "297.82", "760.88", "3371.44")
      (sfx, mult) <- Seq("K" -> 1e3, "M" -> 1e6, "B" -> 1e9, "T" -> 1e12, "" -> 1.0)
    } yield (s"$n$sfx", n.toDouble * mult)
    val got = cases.map(_._1).toDF("s")
      .select(Functions.parseMarketCap(col("s")).as("v"))
      .as[Double].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g === w) }
  }
}
