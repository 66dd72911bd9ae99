package graft

import org.apache.spark.sql.functions._
import graft.ext.TextHash
import graft.plans.VectorExprs

/** The native vector expressions must be BIT-IDENTICAL to the
  * higher-order-function compositions they replaced — same left-to-
  * right IEEE fold, same null/length semantics — or every ANN oracle
  * hash diverges.
  */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  // HOF twins exactly as previously composed in Functions/Similarity
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def hofNorm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
  private def hofSig(emb: org.apache.spark.sql.Column, bits: Int, dims: Int) = {
    val planes = TextHash.hyperplanes(bits, dims)
    (0 until bits).map { j =>
      val w = array(planes(j).map(lit): _*)
      val dot = aggregate(zip_with(emb, w, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  // deterministic pseudo-random doubles incl. negatives and tiny values
  private def vec(seed: Int, n: Int): Seq[Double] =
    (0 until n).map(i => math.sin(seed * 31 + i) * math.exp((i % 7) - 3))

  test("vecDot / vecL2Norm: bit-identical to the HOF folds") {
    val rows = (1 to 50).map(s => (s.toLong, vec(s, 64), vec(s + 1000, 64)))
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
      VectorExprs.vecDot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd"),
      VectorExprs.vecL2Norm(col("a")).as("nn"),
      hofNorm(col("a")).as("hn")).collect()
    got.foreach { r =>
      // exact bit equality, not tolerance
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("vecDot: null element and length mismatch → null (zip_with padding mirror)") {
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))),
      (2L, Seq[Option[Double]](Some(1.0)), Seq[Option[Double]](Some(1.0), Some(2.0))),
      (3L, Seq[Option[Double]](), Seq[Option[Double]]()))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
      VectorExprs.vecDot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd")).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) === ((None, None)))
    assert(got(2L) === ((None, None)))
    assert(got(3L) === ((Some(0.0), Some(0.0)))) // empty fold = seed
  }

  test("signSignature native: identical to the per-plane HOF composition") {
    val dims = 16
    val rows = (1 to 80).map(s => (s.toLong, vec(s, dims))) ++
      // deliberate dims mismatch and a null element → all bits unset in
      // BOTH versions
      Seq((900L, vec(900, 8)))
    val df = rows.toDF("id", "emb")
    for (bits <- Seq(4, 6)) {
      val got = df.select(col("id"),
        VectorExprs.signSignature(col("emb"), TextHash.hyperplanes(bits, dims)).as("ns"),
        hofSig(col("emb"), bits, dims).as("hs")).collect()
      got.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"sig mismatch id=${r.getLong(0)} bits=$bits"))
      assert(got.find(_.getLong(0) == 900L).get.getLong(1) === 0L)
    }
    val withNull = Seq((1L, Seq[Option[Double]](Some(1.0), None)))
      .toDF("id", "emb")
    val g = withNull.select(
      VectorExprs.signSignature(col("emb"), TextHash.hyperplanes(4, 2)).as("ns"),
      hofSig(col("emb"), 4, 2).as("hs")).collect().head
    assert(g.getLong(0) === 0L && g.getLong(1) === 0L)
  }

  test("signSignature refuses more than 64 planes (Long bit capacity)") {
    val planes = (0 until 65).map(_ => Seq(1.0, -1.0))
    val e = intercept[IllegalArgumentException] {
      VectorExprs.signSignature(col("emb"), planes)
    }
    assert(e.getMessage.contains("64"))
  }

  test("codegen compiles with NON-nullable array inputs") {
    // vecDot/vecL2Norm produce NULL even from non-null inputs (null
    // element, length mismatch), so they must declare nullable=true
    // regardless of child nullability. With child-derived nullability,
    // nullSafeCodeGen renders ev.isNull as the literal `false` and the
    // generated `false = true;` fails to compile — Spark then silently
    // falls back to interpreted eval, defeating the expression's
    // purpose. CODEGEN_ONLY makes that fallback a hard error.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // array(lit…) columns are non-nullable with non-null elements
      val df = spark.range(3).select(
        array((1 to 8).map(i => col("id") * i cast "double"): _*).as("a"),
        array((1 to 8).map(i => col("id") + i cast "double"): _*).as("b"))
      assert(!df.schema("a").nullable)
      val rows = df.select(
        VectorExprs.vecDot(col("a"), col("b")).as("nd"),
        VectorExprs.vecL2Norm(col("a")).as("nn"),
        VectorExprs.signSignature(col("a"), TextHash.hyperplanes(4, 8)).as("ns"),
        hofDot(col("a"), col("b")).as("hd"),
        hofNorm(col("a")).as("hn")).collect()
      rows.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(3)))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(4)))
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("interpreted path (eval) matches codegen: constant-folded literals") {
    // literal inputs are evaluated by ConstantFolding via eval(), not
    // generated code — both paths must agree
    val a = typedLit(vec(7, 32))
    val b = typedLit(vec(8, 32))
    val row = spark.range(1).select(
      VectorExprs.vecDot(a, b).as("nd"),
      hofDot(a, b).as("hd"),
      VectorExprs.vecL2Norm(a).as("nn"),
      hofNorm(a).as("hn"),
      VectorExprs.signSignature(a, TextHash.hyperplanes(6, 32)).as("ns"),
      hofSig(a, 6, 32).as("hs")).collect().head
    assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(row.getDouble(1)))
    assert(java.lang.Double.doubleToLongBits(row.getDouble(2)) ===
      java.lang.Double.doubleToLongBits(row.getDouble(3)))
    assert(row.getLong(4) === row.getLong(5))
  }
}
