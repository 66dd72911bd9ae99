package graft

import graft.ext.Similarity

/** Similarity search: brute-force top-k exactness, LSH bucket recall on
  * identical vectors, near-dup pair threshold.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy corpus: v1 ∥ v2 (cos 1), v3 orthogonal to v1, v4 ≈ v1
  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(2.0f, 0.0f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(0.9f, 0.1f, 0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("bruteForceTopK: exact ranking by cosine, tiebreak on id") {
    val q = vecs.filter($"vec_id" === 1L)
    val got = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
      .collect().map(r => (r.getAs[Long]("nbr_id"), r.getAs[Int]("rank")))
    // cos(v1,v2)=1.0 > cos(v1,v4)≈0.994 > cos(v1,v3)=0.0
    assert(got.toSeq === Seq((2L, 1), (4L, 2), (3L, 3)))
  }

  test("nearDupPairs: parallel vectors found at threshold, orthogonal not") {
    val got = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.99, 4, 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got.contains((1L, 2L))) // identical direction → same sign bucket
    assert(!got.exists { case (a, b) => Set(a, b) === Set(1L, 3L) })
  }

  test("bitsFor: signature width grows with corpus size, floor 4") {
    assert(Similarity.bitsFor(100) === 4)
    assert(Similarity.bitsFor(500) === 4)   // verify corpus (sf0.01)
    assert(Similarity.bitsFor(2000) === 6)  // bench corpus (sf0.1)
    assert(Similarity.bitsFor(1000000) === 15)
    assert(Similarity.bitsFor(1000000000L) === 25)
  }

  test("scale-adaptive bits keep the bucketed self-join sub-quadratic on a skewed corpus") {
    import org.apache.spark.sql.functions._
    // 512 deterministic pseudo-random 16-dim vectors (skewed: all
    // entries positive-biased, so naive bucketing would crowd buckets)
    val n = 512
    val dims = 16
    val corpus = (0 until n).map { i =>
      (i.toLong, (0 until dims).map { d =>
        (((i * 131 + d * 37) % 19) - 7).toFloat // range [-7, 11] — biased positive
      })
    }.toDF("vec_id", "embedding")
    val bits = Similarity.bitsFor(n) // 512/32 = 16 → 4 bits
    val sigs = corpus.select(
      Similarity.signSignature(
        graft.functions.Functions.toDoubleArray(col("embedding")), bits, dims)
        .as("sig"))
      .groupBy("sig").count().collect().map(_.getAs[Long]("count"))
    // candidate pairs the self-join generates = Σ C(bucket, 2); the
    // all-pairs square is n(n-1)/2 = 130,816
    val candPairs = sigs.map(c => c * (c - 1) / 2).sum
    assert(candPairs < n.toLong * (n - 1) / 2 / 4,
      s"candidate pairs $candPairs should be well under the all-pairs square")
  }

  test("bucketCentroids: same-bucket vectors average exactly; population counted") {
    // v1 ∥ v2 share every sign bit → same bucket; centroid = mean
    val got = Similarity.bucketCentroids(vecs, "vec_id", "embedding", 4, 4)
      .collect().map(r => (r.getAs[Long]("sig"),
        r.getAs[Long]("n"), r.getSeq[Double](r.fieldIndex("centroid"))))
    assert(got.map(_._2).sum === 4L) // every vector in exactly one bucket
    val pair = got.find(_._2 >= 2L)
    assert(pair.isDefined) // v1+v2 (and possibly v4) collide
    val c = pair.get._3
    assert(c.length === 4)
    // first component is the mean of the bucket's first components —
    // all members have x ∈ {1.0, 2.0, 0.9}: mean within (0, 2)
    assert(c.head > 0.0 && c.head <= 2.0)
  }

  test("ivfTopK: probing ALL cells reproduces brute force exactly") {
    import org.apache.spark.sql.functions._
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 3)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val bits = 4
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 5, bits, 64,
      nProbe = 1 << bits) // probe every cell → exhaustive
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
    assert(canon(ivf) === canon(brute))
  }

  test("quantizedRerankTopK: full candidate set reproduces brute force (q146)") {
    import org.apache.spark.sql.functions._
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 3)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val n = emb.count().toInt
    // keep every stage-1 candidate → the re-rank IS brute force (the
    // exact-recovery law: raising nCandidates converges to exact)
    val full = Similarity.quantizedRerankTopK(emb, "vec_id", "embedding",
      q, 5, 256, nCandidates = n)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
    assert(canon(full) === canon(brute))
    // a narrow candidate set is still well-formed: k rows per query,
    // ranks dense from 1, results a subset of the corpus
    val narrow = Similarity.quantizedRerankTopK(emb, "vec_id", "embedding",
      q, 5, 256, nCandidates = 8).collect()
    assert(narrow.length == 15) // 3 queries (vec_id 0,1,2) × k=5
    assert(narrow.map(_.getAs[Int]("rank")).sorted.toSeq ==
      Seq(1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5))
  }

  test("lshTopK multi-probe: results come from probed buckets and distance-1 buckets contribute") {
    import org.apache.spark.sql.functions._
    val dims = 64
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bits = Similarity.bitsFor(emb.count())
    val sigs = emb.select(col("vec_id"),
      Similarity.signSignature(
        graft.functions.Functions.toDoubleArray(col("embedding")), bits, dims)
        .as("sig"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("sig")).toMap
    val got = Similarity.lshTopK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 5), 10, bits, dims)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id")))
    val hammings = got.map { case (q, n) =>
      java.lang.Long.bitCount(sigs(q) ^ sigs(n))
    }
    // structural: every result within Hamming 1 of its query's signature
    assert(hammings.forall(_ <= 1))
    // multi-probe contributed: some neighbor came from a flipped bucket
    assert(hammings.exists(_ == 1))
  }

  test("lshTopK: same-bucket neighbors score, result ⊆ brute-force result") {
    val q = vecs.filter($"vec_id" === 1L)
    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding", q, 3, 4, 4)
      .collect().map(r => (r.getAs[Long]("nbr_id"), r.getAs[Double]("cosine"))).toMap
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
      .collect().map(r => (r.getAs[Long]("nbr_id"), r.getAs[Double]("cosine"))).toMap
    assert(lsh.keySet.subsetOf(brute.keySet))
    lsh.foreach { case (id, c) => assert(c === brute(id)) }
    assert(lsh.contains(2L)) // the parallel vector shares every sign bit
  }

  test("lloydRefineFlat: bit-identical to a driver-side reference of the same law") {
    import org.apache.spark.sql.functions._
    val bits = 4; val dims = 4; val iters = 2
    val n = 24
    val raw = (0 until n).map { i =>
      (i.toLong, (0 until dims).map(d =>
        (((i * 131 + d * 37) % 19) - 7).toFloat))
    }
    val df = raw.toDF("vec_id", "embedding")

    // reference: same ops, same order, on the driver
    val planes = graft.ext.TextHash.hyperplanes(bits, dims).map(_.toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def nrm(a: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * a(i); i += 1 }; math.sqrt(acc)
    }
    def quant(x: Double): Long = // Spark round() = HALF_UP (away from zero)
      BigDecimal(x * Similarity.MeanQuantum)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def meansOf(groups: Map[Long, Seq[Array[Double]]]): Map[Long, (Array[Double], Long)] =
      groups.map { case (k, vs) =>
        val m = (0 until dims).map { p =>
          vs.map(v => quant(v(p))).sum.toDouble / Similarity.MeanQuantum / vs.size
        }.toArray
        k -> (m, vs.size.toLong)
      }
    val vecs0 = raw.map { case (_, e) => e.map(_.toDouble).toArray }
    def sig(v: Array[Double]): Long =
      planes.zipWithIndex.foldLeft(0L) { case (s, (w, j)) =>
        if (dot(v, w) > 0.0) s | (1L << j) else s
      }
    var cents = meansOf(vecs0.groupBy(sig).map { case (k, v) => k -> v.toSeq })
    for (_ <- 1 to iters) {
      val assigned = vecs0.groupBy { v =>
        // argmax cosine, tie-break on cluster id asc — mirror of the
        // row_number() ORDER BY cos DESC, cluster
        cents.toSeq.map { case (k, (c, _)) =>
          (dot(v, c) / (nrm(v) * nrm(c)), k)
        }.minBy { case (cos, k) => (-cos, k) }._2
      }
      cents = meansOf(assigned.map { case (k, v) => k -> v.toSeq })
    }
    val want = cents.toSeq.flatMap { case (k, (m, cn)) =>
      m.zipWithIndex.map { case (x, p) => (k, p, x, cn) }
    }.sortBy(t => (t._1, t._2))

    val got = Similarity.lloydRefineFlat(df, "vec_id", "embedding", bits, dims, iters)
      .orderBy(col("cluster"), col("pos"))
      .collect().map(r => (r.getAs[Long]("cluster"), r.getAs[Int]("pos"),
        r.getAs[Double]("mean"), r.getAs[Long]("n"))).toSeq
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gc, gp, gm, gn), (wc, wp, wm, wn)) =>
      assert(gc == wc && gp == wp && gn == wn)
      assert(java.lang.Double.doubleToLongBits(gm) ==
        java.lang.Double.doubleToLongBits(wm), s"cluster $gc pos $gp")
    }
    // refinement must actually move something vs the seed quantizer
    val seed = Similarity.bucketCentroidsFlat(df, "vec_id", "embedding", bits, dims)
      .orderBy(col("sig"), col("pos"))
      .collect().map(r => (r.getAs[Long]("sig"), r.getAs[Int]("pos"),
        r.getAs[Double]("mean"), r.getAs[Long]("n"))).toSeq
    assert(seed != got)
  }
}
