package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization
  * (canonical decomposition + canonical composition, UAX #15) — the
  * first step of text canonicalization for a training corpus: crawled
  * text mixes precomposed ("é" U+00E9) and combining ("e" + U+0301)
  * forms of the SAME text, which breaks exact dedup keys, shingle
  * fingerprints, and tokenizer vocabularies unless normalized first.
  *
  * Spark has no built-in normalizer; a Scala UDF would be a black box
  * to the optimizer and fall out of whole-stage codegen. This
  * expression stays inside codegen (one `java.text.Normalizer` call in
  * the generated consume loop, no interpreted lambda) with the
  * interpreted `nullSafeEval` twin for non-codegen paths. The fast
  * path is free: `Normalizer.isNormalized` is O(n) scan-only for
  * already-NFC text (the overwhelming case in practice), so the
  * allocation happens only when normalization actually changes bytes.
  *
  * Cross-engine contract: java.text.Normalizer NFC and DuckDB's
  * `nfc_normalize` both implement UAX #15 canonical composition, so
  * outputs agree code point for code point (oracle-pinned in q105).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.NfcNormalizeExpr.nfc($c.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {

  /** Shared by the interpreted and generated paths (one implementation,
    * zero drift). isNormalized first: scan-only for already-NFC text.
    */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Column-API entry point. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(c)))
}
