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

  test("asof backward: result is exactly the argmax prior right row") {
    val tsGen = Gen.choose(0L, 500L)
    val evGen = Gen.listOfN(60, for {
      u <- Gen.choose(1, 5); t <- tsGen; v <- Gen.choose(0, 99)
    } yield (u.toLong, t, v.toDouble))
    for (seed <- 1 to 5) {
      // unique ids per side; timestamps as epoch-second Timestamps
      val ls = sample(evGen, seed).zipWithIndex
        .map { case ((u, t, v), i) => (i.toLong, u, new java.sql.Timestamp(t * 1000), v) }
      val rs = sample(evGen, seed + 100).zipWithIndex
        .map { case ((u, t, v), i) => (1000L + i, u, new java.sql.Timestamp(t * 1000), v) }
      val got = graft.ext.AsOf.joinBackward(
        ls.toDF("event_id", "user_id", "ts", "value"),
        rs.toDF("event_id", "user_id", "ts", "value"),
        Seq("user_id"), "ts", "ts", Seq("event_id", "value"), "r_")
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("r_event_id")).map(_.toLong)).toMap
      // brute-force replay: max (ts, event_id) among right rows with
      // same user and ts <= left ts
      ls.foreach { case (id, u, t, _) =>
        val want = rs.filter(r => r._2 == u && !r._3.after(t))
          .sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._1)
        assert(got(id) === want, s"seed=$seed left=$id")
      }
    }
  }

  test("connected components: endpoints agree; cluster_id is the component min") {
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L) if a != b
    } yield (a, b))
    for (seed <- 1 to 5) {
      val edges = sample(edgeGen, seed)
      val got = graft.ext.Graph.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the star kernel must agree exactly with propagation
      val gotStar = graft.ext.Graph.connectedComponentsStar(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotStar === got, s"star/propagation divergence seed=$seed")
      // driver-side union-find replay
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val want = parent.keys.map(x => x -> x).toMap.keys
        .groupBy(find).flatMap { case (_, m) => val c = m.min; m.map(_ -> c) }
      assert(got === want, s"seed=$seed")
    }
  }

  test("stratified sampling is monotone in rate (lower rate ⊆ higher rate)") {
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "en" else "zh"))
      .toDF("id", "lang")
    def ids(rEn: Double, rZh: Double) = graft.ext.Sampling
      .stratifiedBernoulli(df, "id", "lang", Map("en" -> rEn, "zh" -> rZh),
        0.0, "mono")
      .collect().map(_.getLong(0)).toSet
    val lo = ids(0.2, 0.1)
    val hi = ids(0.6, 0.4)
    assert(lo.subsetOf(hi))
    assert(lo.size < hi.size)
  }

  test("image-header parse law: parse(JDK-encode(w, h)) == (w, h) for random dims") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val dimGen = for {
      w <- Gen.choose(1, 400)
      h <- Gen.choose(1, 400)
    } yield (w, h)
    for (seed <- 1 to 3; fmt <- Seq("png", "jpg")) {
      val dims = sample(Gen.listOfN(10, dimGen), seed + fmt.hashCode)
      dims.foreach { case (w, h) =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val out = new java.io.ByteArrayOutputStream()
        assert(ImageIO.write(img, fmt, out))
        val parsed = graft.ext.ImageHeaders.parse(out.toByteArray)
        assert(parsed.exists(p => p.width == w && p.height == h),
          s"$fmt ${w}x$h parsed as $parsed")
      }
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
