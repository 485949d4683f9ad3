package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Custom Catalyst expressions for the vector/text hot paths.
  *
  * The composable forms (`aggregate`/`zip_with` higher-order functions) are
  * interpreted per element — lambda dispatch and boxing per array slot. On a
  * 100 TB corpus the per-pair cosine and per-doc fingerprint ARE the inner
  * loop, so they get native expressions with `doGenCode` emitting a call to
  * a tight static JVM loop, keeping the whole stage inside codegen.
  *
  * Numeric contract: [[CosineSim]] accumulates dot and norms sequentially in
  * index order, double precision, and returns dot/(sqrt(na)*sqrt(nb)) — the
  * exact arithmetic of the composable form and of DuckDB's
  * list_cosine_similarity, so oracle hash-compare stays bit-identical.
  */
object VectorExpressions {

  /** Cosine similarity as a Column over two array<float>/array<double>. */
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))

  /** 64-bit SimHash over an array<string> of tokens. */
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))

  /** Dot product (same sequential-fold contract as cosine). */
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Index of the nearest centroid by cosine (ties → lowest index). The
    * centroid matrix is driver-side data baked into the expression — the
    * k-means inner loop stays a narrow, codegen'd map over the corpus. */
  def nearest_centroid(vec: Column, cents: Seq[Seq[Double]]): Column =
    column(NearestCentroid(expression(vec), cents.map(_.toArray).toArray))

  /** Index of the nearest centroid by ROUND(squared-L2, 6) (ties → lowest
    * index) — the oracle-portable Lloyd assignment ([[graft.operators
    * .KMeans]]): rounding to 6 decimals before comparing means a
    * sub-1e-6 float wobble between engines cannot flip the argmin, the
    * same trick q69's rank ordering uses. Codegen'd for the same reason
    * as [[nearest_centroid]] — the assignment is the k-means inner loop. */
  def nearest_centroid_l2(vec: Column, cents: Seq[Seq[Double]]): Column =
    column(NearestCentroidL2(expression(vec), cents.map(_.toArray).toArray))
}

/** Static kernels invoked from generated code (must stay public: codegen'd
  * Java calls the static forwarders directly). */
object VecUtil {
  private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  // Mismatched dimensions are corrupt input, not a prefix to silently
  // truncate to — erroring matches the oracle (DuckDB's
  // list_cosine_similarity raises on length mismatch).
  private def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"vector dimension mismatch: $n vs ${b.numElements()}")
    n
  }

  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = checkDims(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aFloat); val y = get(b, i, bFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = checkDims(a, b)
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i, aFloat) * get(b, i, bFloat); i += 1 }
    s
  }

  /** SimHash: per token t, h = xxh64(t, seed 42); counter c_i += (bit_i(h) ?
    * 1 : -1); fingerprint bit_i = (c_i >= 0). Order-independent, so equal to
    * the exploded sum-per-bit formulation. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L; var i = 0
    while (i < 64) { if (counts(i) >= 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** Argmin over centroids of round(squared-L2(v, c), 6); strict < keeps
    * the lowest index on ties — same order as (d2 ASC, cid ASC). The
    * rounding replicates Spark's `round(_, 6)` on doubles (BigDecimal of
    * the SHORTEST decimal representation, HALF_UP) so this kernel is
    * bit-equal to the composable zip_with/aggregate + round form the q81
    * oracle was validated against. d2 accumulates left to right in index
    * order — the same fold order as the HOF form and DuckDB's list_sum. */
  def nearestL2(v: ArrayData, isFloat: Boolean, cents: Array[Array[Double]]): Long = {
    var best = Double.PositiveInfinity; var bestId = 0L
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = v.numElements()
      if (n != cv.length) throw new IllegalArgumentException(
        s"vector dimension mismatch: $n vs centroid ${cv.length}")
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val d = get(v, i, isFloat) - cv(i)
        d2 += d * d
        i += 1
      }
      val r = new java.math.BigDecimal(java.lang.Double.toString(d2))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (r < best) { best = r; bestId = c }
      c += 1
    }
    bestId
  }

  /** Argmax over centroids of cosine(v, c); strict > keeps the lowest
    * index on ties — same order as (sim DESC, list_id ASC). */
  def nearest(v: ArrayData, isFloat: Boolean, cents: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity; var bestId = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = v.numElements()
      if (n != cv.length) throw new IllegalArgumentException(
        s"vector dimension mismatch: $n vs centroid ${cv.length}")
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      while (i < n) {
        val x = get(v, i, isFloat); val y = cv(i)
        dot += x * y; nv += x * x; nc += y * y
        i += 1
      }
      val sim = dot / (math.sqrt(nv) * math.sqrt(nc))
      if (sim > best) { best = sim; bestId = c }
      c += 1
    }
    bestId
  }
}

private[expressions] trait VecPairExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  protected def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

case class CosineSim(left: Expression, right: Expression) extends VecPairExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VecUtil.cosine($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends VecPairExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left), isFloatArr(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VecUtil.dot($a, $b, ${isFloatArr(left)}, ${isFloatArr(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(tokens: Any): Any =
    VecUtil.simhash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.expressions.VecUtil.simhash($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Nearest-centroid argmax with the centroid matrix as bound driver-side
  * data (nLists × dim doubles — tiny; ships inside the serialized plan the
  * same way a broadcast literal would). */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "nearest_centroid"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float>/array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VecUtil.nearest(v.asInstanceOf[ArrayData], isFloat, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.VecUtil.nearest($v, $isFloat, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[VecUtil.nearestL2]] as a codegen'd unary expression — the Lloyd
  * assignment map of [[graft.operators.KMeans]]. LongType so the cluster
  * id plugs straight into long-keyed aggregates and joins. */
case class NearestCentroidL2(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "nearest_centroid_l2"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_l2 requires array<float>/array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    VecUtil.nearestL2(v.asInstanceOf[ArrayData], isFloat, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.VecUtil.nearestL2($v, $isFloat, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
