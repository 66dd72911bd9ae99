package graft

import org.apache.spark.sql.functions._
import graft.ext.Sketches

/** Count-min sketch laws: overestimate-only, per-row mass conservation,
  * weighted-insert equivalence, and zero for terms probed against cells
  * never written.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // zipfy deterministic stream: term t_k appears ~60/k times
  private val stream = (1 to 40).flatMap(k =>
    Seq.fill(60 / k)(s"t_$k")).toDF("term")

  test("cms never underestimates, and is exact when no row collides") {
    val depth = 4; val width = 64
    val cms = Sketches.countMin(stream, "term", depth, width)
    val exact = stream.groupBy("term").agg(count(lit(1)).as("n_exact"))
    val est = Sketches.estimateMin(cms, exact, "term", depth, width)
      .as[(String, Long, Long)].collect()
    est.foreach { case (t, ex, e) => assert(e >= ex, s"$t: est $e < exact $ex") }
    // tiny vocabulary (40 terms) vs 4x64 cells: some row almost surely
    // separates every pair; if the law holds the min picks it up
    assert(est.count { case (_, ex, e) => e == ex } >= 30)
  }

  test("screened exact heavy hitters equal plain HAVING (q140 law)") {
    // tiny width FORCES collisions → the screen passes false positives;
    // the exact verify must remove every one of them, at any threshold
    for (width <- Seq(4, 16, 1024); thr <- Seq(1L, 5L, 30L, 61L)) {
      val depth = 3
      val cms = Sketches.countMin(stream, "term", depth, width)
      val got = Sketches
        .screenEstimate(stream, "term", cms, depth, width, "n_est")
        .filter(col("n_est") >= thr)
        .groupBy("term").agg(count(lit(1)).as("n"))
        .filter(col("n") >= thr)
        .as[(String, Long)].collect().toSet
      val want = stream.groupBy("term").agg(count(lit(1)).as("n"))
        .filter(col("n") >= thr).as[(String, Long)].collect().toSet
      assert(got == want, s"width=$width thr=$thr")
      if (thr == 61L) assert(want.isEmpty) // max count is 60
      if (thr == 1L) assert(want.size == 40) // every term survives
    }
  }

  test("screenEstimate matches estimateMin per term (row-local probe law)") {
    val depth = 4; val width = 8 // collision-rich
    val cms = Sketches.countMin(stream, "term", depth, width)
    val byRow = Sketches
      .screenEstimate(stream.distinct(), "term", cms, depth, width, "n_est")
      .as[(String, Long)].collect().toMap
    val byProbe = Sketches
      .estimateMin(cms, stream.distinct(), "term", depth, width)
      .as[(String, Long)].collect().toMap
    assert(byRow == byProbe)
  }

  test("each hash row conserves the total stream mass") {
    val depth = 3; val width = 16
    val cms = Sketches.countMin(stream, "term", depth, width)
    val n = stream.count()
    val perRow = cms.groupBy("row").agg(sum("cnt").as("mass"))
      .as[(Int, Long)].collect().toMap
    assert(perRow.keySet == (0 until depth).toSet)
    perRow.values.foreach(m => assert(m == n))
  }

  test("weighted vocabulary insert equals per-occurrence insert") {
    val depth = 4; val width = 32
    val occ = Sketches.countMin(stream, "term", depth, width)
      .as[(Int, Int, Long)].collect().toSet
    val vocab = stream.groupBy("term").agg(count(lit(1)).as("n"))
    val wtd = Sketches.countMin(vocab, "term", depth, width, col("n"))
      .as[(Int, Int, Long)].collect().toSet
    assert(occ == wtd)
  }

  test("probing an empty sketch estimates zero (left-join law)") {
    val depth = 4; val width = 32
    val empty = Sketches.countMin(stream.limit(0), "term", depth, width)
    val est = Sketches.estimateMin(empty, Seq("ghost").toDF("term"),
      "term", depth, width).as[(String, Long)].collect()
    assert(est.toSeq == Seq(("ghost", 0L)))
  }

  test("countMin rejects non-positive sizing") {
    intercept[IllegalArgumentException](
      Sketches.countMin(stream, "term", 0, 8))
    intercept[IllegalArgumentException](
      Sketches.countMin(stream, "term", 4, 0))
  }

  private val keyed = (1 to 500).map(k =>
    (if (k % 2 == 0) "even" else "odd", s"user_$k"))
    .toDF("grp", "key")

  test("hllRegisters: duplicate keys never move a register (set semantics)") {
    val once = Sketches.hllRegisters(keyed, "grp", "key", 64)
    val thrice = Sketches.hllRegisters(
      keyed.union(keyed).union(keyed), "grp", "key", 64)
    assert(once.collect().toSet === thrice.collect().toSet)
  }

  test("hllRegisters: union of sketches = element-wise max (mergeability)") {
    val h1 = keyed.filter(col("key").substr(6, 10).cast("int") <= 250)
    val h2 = keyed.filter(col("key").substr(6, 10).cast("int") > 250)
    val merged = Sketches.hllRegisters(h1, "grp", "key", 64)
      .union(Sketches.hllRegisters(h2, "grp", "key", 64))
      .groupBy("grp", "bucket").agg(max("register").as("register"))
    val whole = Sketches.hllRegisters(keyed, "grp", "key", 64)
    assert(merged.collect().toSet === whole.collect().toSet)
  }

  test("hllRegisters: registers bounded by the hash geometry") {
    val regs = Sketches.hllRegisters(keyed, "grp", "key", 64)
      .as[(String, Int, Int)].collect()
    regs.foreach { case (_, b, r) =>
      assert(b >= 0 && b < 64, s"bucket $b out of range")
      assert(r >= 1 && r <= 55, s"register $r out of [1,55]")
    }
    // 250 keys into 64 buckets: expect most buckets populated per group
    assert(regs.count(_._1 == "even") > 40)
    intercept[IllegalArgumentException](
      Sketches.hllRegisters(keyed, "grp", "key", 63)) // not a power of two
  }

  test("rolling register merge equals a from-scratch sketch of the window") {
    // keys spread over days 0..9; the 7-day rolling max at day 6 must
    // equal a sketch built directly from days 0..6 — the element-wise
    // max merge law applied across time
    val dayRows = (1 to 400).map(k => (k.toLong % 10, s"user_$k"))
      .toDF("day", "key")
    val daily = Sketches.hllRegisters(dayRows, "day", "key", 64)
    val days = daily.select(col("day").as("at_day")).distinct()
    val rollingAt6 = daily
      .join(days, col("day").between(col("at_day") - 6, col("at_day")))
      .groupBy(col("at_day"), col("bucket"))
      .agg(max("register").as("register"))
      .filter(col("at_day") === 6)
      .select("bucket", "register")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    val direct = Sketches.hllRegisters(
        dayRows.filter(col("day") <= 6).withColumn("g", lit(1)), "g", "key", 64)
      .select("bucket", "register")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(rollingAt6 === direct)
  }

  test("native HLL (q127): union of shard sketches = sketch of the whole, " +
       "estimate within 3 sigma of exact") {
    // 20k keys with heavy duplication across 10 shards — shards overlap
    // so sum-of-shard-distincts ≠ global distinct (the reason sketches
    // are stored at all). lgK=12 → RSE 1.039/√4096 ≈ 1.62%.
    val rows = (1 to 60000).map(i => ((i % 10).toLong, (i % 20000).toLong))
      .toDF("shard", "key")
    val shardSketches = rows.groupBy("shard")
      .agg(hll_sketch_agg(col("key"), lit(12)).as("sk"))
    val viaUnion = shardSketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("est"))
      .collect()(0).getLong(0)
    val direct = rows
      .agg(hll_sketch_estimate(hll_sketch_agg(col("key"), lit(12))).as("est"))
      .collect()(0).getLong(0)
    // mergeability is lossless at equal lgK: register-wise max commutes
    // with insertion order, so both paths see identical registers
    assert(viaUnion === direct, "union-of-shards must equal sketch-of-whole")
    val exact = 20000.0
    assert(math.abs(viaUnion - exact) / exact <= 3 * 0.0162,
      s"estimate $viaUnion outside 3 sigma of $exact")
  }
}
