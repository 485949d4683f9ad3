package graft.functions.expressions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Distinct word-n-gram shingle hashes straight from a token array.
  *
  * The composable pipeline (transform over an index sequence building each
  * n-gram STRING with slice + array_join, then xxhash64 on the string) pays
  * interpreted lambda dispatch plus a string allocation per shingle — it was
  * the dominant cost of the dedup path. Here each token hashes once and
  * n-gram identity is a hash chain over the window, all primitive longs.
  *
  * Hash identity differs from xxhash64-of-joined-string, which is fine:
  * every consumer (Jaccard counting, MinHash) only needs a deterministic
  * injective-in-practice shingle key, not specific values.
  */
object ShingleHashes {
  def shingle_hashes(tokens: Column, n: Int): Column =
    column(ShingleHashesExpr(expression(tokens), n))

  /** Non-distinct variant: one hash PER OCCURRENCE, for multiplicity
    * consumers (repetition scoring) where duplicate grams are the signal. */
  def gram_hashes(tokens: Column, n: Int): Column =
    column(ShingleHashesExpr(expression(tokens), n, distinct = false))
}

case class ShingleHashesExpr(child: Expression, n: Int,
    distinct: Boolean = true) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def prettyName: String = "shingle_hashes"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.simpleString}")
  }

  def compute(tokens: ArrayData): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val tok = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = tokens.getUTF8String(i)
      tok(i) = if (s == null) 0L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = 0x27d4eb2f165667c5L // chain seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(tok(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    if (!distinct) return new GenericArrayData(out)
    // distinct: sort + unique (arrays are small; avoids boxing)
    Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(Arrays.copyOf(out, w))
  }

  override def nullSafeEval(arr: Any): Any = compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleExpr", this, classOf[ShingleHashesExpr].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
