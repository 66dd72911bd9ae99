package graft

import org.apache.spark.sql.functions._
import graft.functions.Functions._

/** Scalar-function semantics vs the reference's Python behavior
  * (SURVEY.md §2.8; sites cited in Functions.scala).
  */
class FunctionsSpec extends SparkSpec {

  private def overStrings(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                          inputs: String*): Seq[Any] = {
    import spark.implicits._
    inputs.map(s => Seq(Option(s)).toDF("v").select(c(col("v")).as("r"))
      .collect()(0).get(0))
  }

  test("parseMarketCap: suffixes, thousands separators, garbage") {
    val got = overStrings(parseMarketCap,
      "32.42B", "760.88M", "297.82K", "3,371.44B", "1.5T", "", "n/a", "42")
    assert(got === Seq(3.242e10, 7.6088e8, 297820.0, 3.37144e12, 1.5e12,
      null, null, 42.0))
  }

  test("parseMarketCap round-trip: value * suffix parses back exactly") {
    // property over a grid: formatted "x.yzS" strings must parse to
    // x.yz * mult with no drift (decimal-exact inputs)
    for (n <- Seq("1.25", "999.99", "0.5", "42");
         (sfx, mult) <- Seq("K" -> 1e3, "M" -> 1e6, "B" -> 1e9, "T" -> 1e12)) {
      val got = overStrings(parseMarketCap, s"$n$sfx")(0)
      assert(got === n.toDouble * mult, s"$n$sfx")
    }
  }

  test("employeesToInt: numeric tokens (signed, exponent) vs digit-strip") {
    val got = overStrings(employeesToInt,
      "1200", "1200.5", "-5", "1.2e3", "1,200", "about 300 people", "", "x")
    assert(got === Seq(1200, 1200, -5, 1200, 1200, 300, null, null))
  }

  test("hqParts: 1/2/3/4-part splits (Summary.py:137-146)") {
    import spark.implicits._
    val rows = Seq(
      "It is headquartered in Austin, Texas, United States.",
      "Beta LLC is headquartered in Paris, France.",
      "Gamma is headquartered in Singapore.",
      "Delta, headquartered in San Jose, California, Santa Clara County, United States, makes widgets.",
      "No location sentence here")
      .toDF("s").select(hqParts(col("s")).as("h"))
      .select(col("h.hq_city"), col("h.hq_state"), col("h.hq_country"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2)))
    assert(rows(0) === (("Austin", "Texas", "United States")))
    assert(rows(1) === (("Paris", null, "France")))
    assert(rows(2) === (("Singapore", null, null)))
    // the reference regex captures up to the sentence period, so the
    // trailing clause rides along in the re-joined country tail —
    // faithful to Summary.py:137-146, quirk and all
    assert(rows(3) === (("San Jose", "California",
      "Santa Clara County, United States, makes widgets")))
    assert(rows(4) === ((null, null, null)))
  }

  test("foundedYear + formerName: case-insensitive, boundary-anchored") {
    assert(overStrings(foundedYear, "was FOUNDED IN 2001.", "founded in 87",
      "no year") === Seq(2001, null, null))
    assert(overStrings(formerName,
      "Acme, formerly known as OldAcme Inc, was great",
      "nothing") === Seq("OldAcme Inc", null))
  }

  test("cleanText: falsy passthrough, collapse, whitespace-only edge") {
    assert(overStrings(cleanText, "  a   b\t c ", "", null, "   ") ===
      Seq("a b c", null, null, "")) // whitespace-only → "" (ref checks falsiness BEFORE cleaning)
  }

  test("pyOr: empty string falls through, last operand verbatim") {
    import spark.implicits._
    val r = Seq(("", "x"), (null, "y"), ("a", "b"), ("", ""))
      .toDF("u", "v").select(pyOr(col("u"), col("v")).as("r"))
      .collect().map(_.get(0))
    assert(r === Seq("x", "y", "a", ""))
  }

  test("nanToNull guards NaN and both infinities") {
    import spark.implicits._
    val r = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 1.5)
      .toDF("v").select(nanToNull(col("v")).as("r")).collect().map(_.get(0))
    assert(r === Seq(null, null, null, 1.5))
  }

  test("dateFromPrefix: 10-char prefix parse, null on failure") {
    val got = overStrings(dateFromPrefix,
      "2024-12-31 00:00:00", "2024-12-31", "garbage", "")
    assert(got.map(Option(_).map(_.toString)) ===
      Seq(Some("2024-12-31"), Some("2024-12-31"), None, None))
  }

  test("cosineSim: exact values and zero-norm null") {
    import spark.implicits._
    val r = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0)))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("r"))
      .collect().map(_.get(0))
    assert(r === Seq(1.0, 0.0, null))
  }

  test("VARIANT payload access (q126) agrees with get_json_object (q101) " +
       "on every shared column of the drift fixture") {
    // SURVEY §1.2 promises BOTH access paths for the open-ended payload;
    // this pins that they are the same function: per symbol, the four
    // leaves read via try_parse_json + variant_get equal the ones read
    // via get_json_object + cast — including the malformed-document and
    // missing-key nulls. q126's extra try_variant_get column is checked
    // separately (failed cast → null, never an error).
    import graft.queries.ReferenceQueries
    val shared = Seq("symbol", "audit_risk", "overall_risk", "phone",
      "governance_epoch")
    val viaVariant = ReferenceQueries.defs("q126_variant_payload")(spark, "")
    val viaString = ReferenceQueries.defs("q101_untyped_payload")(spark, "")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(shared.map(col): _*).collect()
        .map(r => shared.map(r.getAs[Any]).toList).sortBy(_.head.toString)
    assert(rows(viaVariant) === rows(viaString))
    val phoneAsInt = viaVariant.select("phone_as_int").collect().map(_.get(0))
    assert(phoneAsInt.forall(_ == null),
      "try_variant_get of a non-numeric string as int must be null")
  }
}
