package graft

import org.apache.spark.sql.functions._
import graft.ext.TextNorm
import graft.plans.NfcNormalizeExpr

/** NFC native expression + canonicalization pipeline laws. */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private def nfcOf(s: String): String =
    Seq(s).toDF("t").select(NfcNormalizeExpr.nfcNormalize(col("t")))
      .collect().head.getString(0)

  test("nfcNormalize: composes combining marks, maps singletons, keeps ligatures") {
    assert(nfcOf("Café") == "Café")   // e + U+0301 → é
    assert(nfcOf("Å") == "Å")          // Angstrom sign → Å
    assert(nfcOf("ﬁ") == "ﬁ")          // NFC ≠ NFKC: ﬁ stays
    assert(nfcOf("plain ascii") == "plain ascii")
    assert(nfcOf("") == "")
    // supplementary plane survives the round-trip untouched
    val emoji = new String(Character.toChars(0x1F600))
    assert(nfcOf(s"a${emoji}b") == s"a${emoji}b")
  }

  test("nfcNormalize: codegen and interpreted paths agree") {
    val inputs = Seq("Café x", "Å", "ﬁ", "abc", "")
    val df = inputs.toDF("t")
    val viaCodegen = df.select(NfcNormalizeExpr.nfcNormalize(col("t")))
      .collect().map(_.getString(0)).toSeq
    // a filter on the expression forces interpreted eval in the
    // predicate too; compare against direct JVM normalization
    val expected = inputs.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(viaCodegen == expected)
    assert(NfcNormalizeExpr.nfc("Café") == "Café")
  }

  test("nfcNormalize: null in, null out") {
    val out = Seq(Some("a"), None).toDF("t")
      .select(NfcNormalizeExpr.nfcNormalize(col("t")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq("a", null))
  }

  test("canonicalText: controls stripped, unicode spaces unified, runs collapsed") {
    val rows = Seq(
      "bellandvt" -> "bellandvt",
      "a b c　d" -> "a b c d",
      "line1\r\nline2\tend" -> "line1 line2 end",
      "  padded  " -> "padded",
      "Café  x" -> "Café x")
    val got = rows.map(_._1).toDF("t")
      .select(TextNorm.canonicalText(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == rows.map(_._2))
  }
}
