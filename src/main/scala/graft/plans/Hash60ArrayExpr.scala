package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-element 60-bit content hash of a string array — the native form
  * of `transform(arr, s => conv(substring(md5(s), 1, 15), 16, 10))`.
  *
  * The transform-lambda form evaluates the md5→hex→substring→conv chain
  * INTERPRETED per element (higher-order lambdas are CodegenFallback),
  * allocating a 32-char hex string and a decimal string per shingle; on
  * the Jaccard/MinHash fingerprint path that is the per-document base
  * cost. Here each element is one MD5 digest and one shift: the first
  * 15 hex digits of md5 are exactly the big-endian value of the first 8
  * digest bytes shifted right by one nibble — no hex string, no conv.
  * (Pinned by a parity test against the lambda form; the DuckDB oracle
  * computes the same prefix via substr(md5(s),1,15).)
  *
  * Null mirror of the lambda form: null array → null; null element →
  * null element.
  */
case class Hash60ArrayExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "hash60_array"

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        digest.reset()
        val d = digest.digest(arr.getUTF8String(i).getBytes)
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        out(i) = v >>> 4 // first 15 hex digits of the md5
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hash60Arr", this, classOf[Hash60ArrayExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Hash60ArrayExpr =
    copy(child = newChild)
}

object Hash60ArrayExpr {
  /** Column-API entry point. */
  def hash60Array(c: Column): Column =
    ColumnBridge.column(Hash60ArrayExpr(ColumnBridge.expression(c)))
}
