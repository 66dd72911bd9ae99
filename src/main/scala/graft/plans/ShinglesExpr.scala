package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, as ONE native pass.
  *
  * The Column composition (a zip_with chain over shifted slices +
  * array_distinct) evaluates n−1 interpreted lambda passes and
  * materializes n−1 intermediate arrays per document — the base cost of
  * every shingle-derived operator (exact/MinHash/SimHash dedup, n-gram
  * Jaccard, decontamination). This expression builds the grams in one
  * loop with first-occurrence dedup.
  *
  * Exact semantics mirror of the composition (and of the DuckDB
  * `list_distinct(list_transform(range(…)))` oracle twin):
  *  - grams are the space-joined runs of n consecutive tokens, in
  *    positional order;
  *  - dedup keeps the FIRST occurrence (array_distinct order);
  *  - fewer than n tokens → empty array;
  *  - a NULL token array → empty array (the composition's `when`
  *    guard maps the null condition to the empty branch), so the
  *    result is never null.
  *
  * Codegen calls into [[computeOrEmpty]] — one virtual call per row
  * inside the consume loop (the same shape as Spark's own
  * StaticInvoke-backed expressions), zero interpreted lambdas.
  */
case class ShinglesExpr(child: Expression, n: Int,
                        distinct: Boolean = true) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (distinct) "shingles" else "shingles_all"

  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any =
    computeOrEmpty(child.eval(input).asInstanceOf[ArrayData])

  def computeOrEmpty(toks: ArrayData): ArrayData = {
    if (toks == null) return Empty
    val len = toks.numElements()
    if (len < n) return Empty
    // distinct=false keeps the full positional multiset — the input the
    // repetition profile needs (duplicate grams ARE the signal there)
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]
      else new java.util.ArrayList[UTF8String](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var gram = toks.getUTF8String(i)
      var j = 1
      while (j < n) {
        gram = UTF8String.concat(gram, Space, toks.getUTF8String(i + j))
        j += 1
      }
      out.add(gram): Unit
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[ShinglesExpr].getName)
    val childGen = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = childGen.code +
        code"""
           |final $arrCls ${ev.value} =
           |  $ref.computeOrEmpty(${childGen.isNull} ? null : ${childGen.value});
         """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  /** Column-API entry point (distinct set — dedup/LSH operators). */
  def shingles(toks: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(toks), n))

  /** All positional n-grams, duplicates preserved (repetition profile). */
  def shinglesAll(toks: Column, n: Int): Column =
    ColumnBridge.column(
      ShinglesExpr(ColumnBridge.expression(toks), n, distinct = false))
}
