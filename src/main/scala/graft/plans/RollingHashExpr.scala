package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling polynomial text
  * fingerprint: acc ← (acc·mult + codepoint) mod `mod` over the
  * string's Unicode code points.
  *
  * This is the one curation expression where the Column-composition
  * version is structurally wasteful: `aggregate(transform(split(s,
  * "")), …)` materializes one single-character STRING per input
  * character and then runs the fold as an interpreted higher-order
  * lambda outside codegen — O(n) allocations per row on the corpus hot
  * path. The native expression participates in whole-stage codegen
  * (the fold is inlined into the generated Java consume loop), walks
  * the code points with zero per-character allocation, and carries an
  * interpreted `nullSafeEval` twin for non-codegen paths.
  *
  * Cross-engine contract (stronger than the HOF version's): folding
  * CODE POINTS matches DuckDB `ord()` for ALL of Unicode — the split-
  * per-character composition folded UTF-16 surrogate halves for
  * supplementary-plane text and was documented BMP-only.
  */
case class RollingHashExpr(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $c.toString();
         |long ${ev.value}_acc = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  ${ev.value}_acc = (${ev.value}_acc * ${mult}L + (long) $cp) % ${mod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHashExpr {
  /** Column-API entry point. */
  def rollingHash(c: Column, mult: Long, mod: Long): Column =
    ColumnBridge.column(
      RollingHashExpr(ColumnBridge.expression(c), mult, mod))
}
