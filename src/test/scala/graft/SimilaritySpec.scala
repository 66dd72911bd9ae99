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
}
