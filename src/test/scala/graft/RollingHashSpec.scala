package graft

import org.apache.spark.sql.functions._
import graft.ext.TextHash

/** Native rolling-hash expression: codegen vs interpreted vs a driver-
  * side code-point replay, plus the Unicode contract.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def replay(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % TextHash.FpMod
      i += Character.charCount(cp)
    }
    acc
  }

  private val samples = Seq(
    "", "a", "hello world", "The quick brown fox",
    "Ünïcode tëxt ßøö",     // BMP non-ASCII
    "emoji 😀 tail", // supplementary plane: folds ONE code point
    "tabs\tand\nnewlines")

  test("rollingFingerprint equals the code-point fold (codegen path)") {
    val got = samples.zipWithIndex.map(_.swap).toDF("i", "s")
      .select(col("i"), TextHash.rollingFingerprint(col("s")).as("fp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) === replay(s), s"sample $i: '$s'")
    }
  }

  test("rollingFingerprint: null in, null out") {
    val row = Seq((1, Option.empty[String])).toDF("i", "s")
      .select(TextHash.rollingFingerprint(col("s")).as("fp")).collect().head
    assert(row.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.plans.RollingHashExpr
    samples.foreach { s =>
      val e = RollingHashExpr(Literal(s), 31L, TextHash.FpMod)
      assert(e.eval(null) === replay(s))
    }
  }
}
