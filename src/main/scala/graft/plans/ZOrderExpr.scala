package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Two-dimensional Z-order (Morton) interleave: bit i of x lands at
  * z-bit 2i, bit i of y at 2i+1. Sorting a table by z clusters rows
  * that are close in BOTH dimensions into the same parquet row
  * groups/files, so a 2-D box predicate prunes on both columns' min/max
  * stats — the multi-dimensional generalization of the 1-D
  * sort-within-bucket layout in sources/Sinks (a single-column sort
  * gives perfect pruning on the leading column and none on the other).
  *
  * Native expression rather than a Column composition: the composition
  * is 2·bits shift/mask/or terms (a ~180-node tree at bits=21) that
  * bloats the codegen'd projection for what is a 4-instruction loop
  * body here.
  *
  * Domain contract is LOUD: both inputs must lie in [0, 2^bits) — an
  * out-of-range coordinate would silently interleave garbage and
  * scatter the row across the curve (an invisible layout corruption),
  * so it throws instead. NULL inputs yield NULL (standard null
  * propagation); a layout writer should filter or bucket nulls
  * separately.
  */
case class ZOrderExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31,
    s"zorder2 interleaves 2*bits into a non-negative Long; got bits=$bits (1..31)")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  private def outOfDomain(x: Long, y: Long): Nothing =
    throw new IllegalArgumentException(
      s"zorder2($x, $y) out of domain [0, 2^$bits): raise bits or " +
        "pre-normalize the columns — masking would silently corrupt the curve")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    // >>> shifts zeros in, so a negative value (sign bit set) or any
    // value >= 2^bits leaves a nonzero high part
    if (((x | y) >>> bits) != 0L) outOfDomain(x, y)
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val errClass = classOf[IllegalArgumentException].getName
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |if ((($a | $b) >>> $bits) != 0L) {
         |  throw new $errClass("zorder2(" + $a + ", " + $b +
         |    ") out of domain [0, 2^$bits): raise bits or pre-normalize " +
         |    "the columns - masking would silently corrupt the curve");
         |}
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i) | (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {
  /** Column-API entry point; callers cast coordinates to long. */
  def zorder2(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      ZOrderExpr(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
