package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding-similarity hot path.
  *
  * The Column-composition versions (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` etc.) are higher-order functions — CodegenFallback
  * expressions that evaluate an interpreted lambda per element and
  * materialize an intermediate array per call. On the candidate-pair
  * scoring path (nearDupPairs / lshTopK / ivfTopK verify stage) that is
  * O(pairs · dims) interpreted work with O(pairs) allocations — the
  * dominant cost of q30 at bench scale. These expressions inline the
  * same folds into whole-stage codegen with zero per-row allocation.
  *
  * Determinism contract (must hold or every ANN oracle hash diverges):
  * each fold runs LEFT TO RIGHT over the array exactly like the HOF
  * version — `acc = acc + a(i)*b(i)` is the identical IEEE operation
  * sequence the `zip_with`+`aggregate` pair executes, so results are
  * bit-identical to both the previous Column composition and the DuckDB
  * `list_reduce` oracle twins.
  *
  * Null semantics mirror the HOF versions: a NULL array or a NULL
  * element (or a length mismatch, which `zip_with` pads with nulls)
  * poisons the fold → result NULL.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // NULL is produced even from non-null inputs (null element, length
  // mismatch) — without this override nullSafeCodeGen renders ev.isNull
  // as the `false` literal under non-nullable children and the generated
  // `false = true;` fails to compile (interpreter fallback).
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** sqrt of the sequential sum of squares — `sqrt(aggregate(a, 0.0,
  * (acc, x) => acc + x*x))` as one codegen'd loop.
  */
case class L2NormExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  // null elements yield NULL from non-null arrays — see DotProductExpr
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2norm"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = $a.getDouble($i);
         |  $acc += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2NormExpr =
    copy(child = newChild)
}

/** The full sign-LSH signature in ONE pass over the embedding: bit j is
  * set iff the dot product with ±1 hyperplane j is positive. Replaces
  * `bits` separate HOF folds (each with its own per-row intermediate
  * array) with a single codegen'd nested loop over a referenced
  * double[][] plane matrix.
  *
  * Per-plane dots run the same left-to-right fold as the HOF version →
  * bit-identical signs. Null/length mirror of the composition: a null
  * element or a length mismatch made each plane's dot NULL, and
  * `when(dot > 0.0, …).otherwise(0)` mapped NULL to an unset bit — so
  * here any null element or dims mismatch yields signature 0 (all bits
  * unset), exactly as before. (A NULL embedding returns NULL where the
  * composition returned 0 — no corpus in the test universe carries
  * null embeddings; documented deviation.)
  */
case class SignSignatureExpr(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  // one bit per hyperplane packed into a Long: a 65th plane would wrap
  // the Java shift (1L << j uses j mod 64) and silently overwrite bit 0
  require(planes.length <= 64,
    s"sign_signature packs one bit per plane into a Long; got " +
      s"${planes.length} planes (max 64)")

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_signature"

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sig = 0L
    var j = 0
    while (j < planeArr.length) {
      val w = planeArr(j)
      if (n == w.length) {
        var acc = 0.0
        var i = 0
        var hasNull = false
        while (i < n && !hasNull) {
          if (x.isNullAt(i)) hasNull = true
          else acc += x.getDouble(i) * w(i)
          i += 1
        }
        if (!hasNull && acc > 0.0) sig |= 1L << j
      }
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $planesRef.length; $j++) {
         |  final double[] $w = $planesRef[$j];
         |  if ($n == $w.length) {
         |    double $acc = 0.0;
         |    boolean $bad = false;
         |    for (int $i = 0; $i < $n && !$bad; $i++) {
         |      if ($a.isNullAt($i)) { $bad = true; }
         |      else { $acc += $a.getDouble($i) * $w[$i]; }
         |    }
         |    if (!$bad && $acc > 0.0) $sig |= 1L << $j;
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignSignatureExpr =
    copy(child = newChild)
}

object VectorExprs {
  /** Column-API entry points. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecL2Norm(a: Column): Column =
    ColumnBridge.column(L2NormExpr(ColumnBridge.expression(a)))

  def signSignature(emb: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(
      SignSignatureExpr(ColumnBridge.expression(emb), planes))
}
