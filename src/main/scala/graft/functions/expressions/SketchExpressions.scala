package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Sketch expressions: per-row MinHash signatures and LSH bucket arrays.
  *
  * Both replace a whole explode→shuffle→aggregate subplan with one codegen
  * call per row:
  *  - [[MinHashSig]]: the exploded-shingle formulation shuffles |doc| rows
  *    per doc and runs a 64-column min-aggregate; this computes the whole
  *    signature in a tight loop over the (row-local) shingle array. The
  *    minhash pipeline becomes shuffle-free until LSH banding.
  *  - [[LshBuckets]]: random-hyperplane sign buckets for all tables at once
  *    (the composable zip_with form pays interpreted lambda dispatch per
  *    vector element per plane per table).
  */
object SketchExpressions {

  /** k-permutation MinHash signature over an array<string> of shingles. */
  def minhash_sig(shingles: Column, k: Int = 64, seed: Long = 42L): Column =
    column(MinHashSig(expression(shingles), k, seed))

  /** nTables LSH sign-buckets (nPlanes bits each) over array<float/double>. */
  def lsh_buckets(vec: Column, nTables: Int, nPlanes: Int): Column =
    column(LshBuckets(expression(vec), nTables, nPlanes))

  /** Multiplicity statistics [total, distinct, max_count] of an
    * array<long> — the row-local kernel behind repetition scoring. */
  def multiplicity_stats(hashes: Column): Column =
    column(MultiplicityStats(expression(hashes)))

  /** Fraction of equal positions of two equal-length array<long> MinHash
    * signatures — the standard Jaccard estimator. */
  def sig_agreement(a: Column, b: Column): Column =
    column(SigAgreement(expression(a), expression(b)))

  /** Membership of a long in a SORTED plan-embedded literal set, via
    * binary search — O(log n) per probe where array_contains scans the
    * whole literal. The hot-set membership kernel for
    * [[graft.operators.Dedup.dropCommonSegments]]-style literal filters,
    * whose sets can legally reach 100k entries. */
  def in_sorted_longs(v: Column, sorted: Array[Long]): Column =
    column(InSortedLongs(expression(v), sorted))

  /** |a ∩ b| for two SORTED distinct long arrays (one linear merge, no
    * allocation) — the row-local exact-Jaccard kernel for candidate-pair
    * verification when per-doc shingle arrays travel by id instead of
    * exploding through a shingle join. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))
}

/** Binary-search membership in a sorted long literal. The set rides the
  * expression the way [[MinHashSig]]'s coefficients do: driver-built,
  * serialized once per task, never a per-row allocation. Callers MUST
  * pass a sorted array (require-checked) — silently wrong answers
  * otherwise. */
case class InSortedLongs(child: Expression, sorted: Array[Long])
    extends UnaryExpression {
  require(sorted.length <= 1 ||
    sorted.sliding(2).forall(p => p(0) <= p(1)),
    "in_sorted_longs requires a sorted set")
  override def prettyName: String = "in_sorted_longs"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"in_sorted_longs requires a bigint probe, got ${other.simpleString}")
  }

  def compute(v: Long): Boolean =
    java.util.Arrays.binarySearch(sorted, v) >= 0

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("inSortedExpr", this, classOf[InSortedLongs].getName)
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> (raw shingles) or array<long> " +
        s"(pre-hashed, e.g. shingle_hashes), got ${other.simpleString}")
  }

  @transient private lazy val inputIsString = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  // Same (a, b) derivation as Dedup.minhashSignatures historically used:
  // p = 2^31-1 keeps a*x+b within a signed long.
  @transient private lazy val coeffs: Array[Long] = {
    val p = MinHashSig.P
    val rnd = new scala.util.Random(seed)
    Array.fill(k * 2) { 0L }.zipWithIndex.map { case (_, i) =>
      if (i % 2 == 0) rnd.nextLong().abs % (p - 1) + 1 else rnd.nextLong().abs % p
    }
  }

  def compute(shingles: ArrayData): ArrayData = {
    val p = MinHashSig.P
    val n = shingles.numElements()
    // no shingles -> no signature: a k*Long.MaxValue sentinel would make
    // every empty doc collide in every LSH band (quadratic false pairs)
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val h =
        if (inputIsString) {
          val s = shingles.getUTF8String(t)
          if (s == null) 0L
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        } else shingles.getLong(t)
      val x = ((h % p) + p) % p // pmod
      var i = 0
      while (i < k) {
        val v = (coeffs(2 * i) * x + coeffs(2 * i + 1)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  override def nullable: Boolean = true

  override def nullSafeEval(arr: Any): Any = compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSig].getName)
      s"""
         |${ev.value} = $ref.compute($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSig { val P: Long = 2147483647L }

/** [total, distinct, max multiplicity] of an array<long> in one pass over
  * a row-local open-addressing table — no explode, no (doc, gram) shuffle:
  * the repetition signals (Gopher-style duplicate-n-gram filters) stay a
  * narrow map over the corpus. Element identity is the 64-bit value, which
  * for shingle_hashes input means the same ~1e-15 collision caveat as the
  * dedup joins. */
case class MultiplicityStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "multiplicity_stats"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multiplicity_stats requires array<long> (e.g. shingle_hashes), " +
        s"got ${other.simpleString}")
  }

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array(0L, 0L, 0L))
    var cap = 4
    while (cap < n * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val counts = new Array[Int](cap)
    val mask = cap - 1
    var distinct = 0L
    var maxCount = 0
    var i = 0
    while (i < n) {
      val k = a.getLong(i)
      // finalizer-style mix spreads sequential hashes across the table
      var slot = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
      var placed = false
      while (!placed) {
        if (counts(slot) == 0) {
          keys(slot) = k; counts(slot) = 1; distinct += 1
          if (maxCount < 1) maxCount = 1
          placed = true
        } else if (keys(slot) == k) {
          counts(slot) += 1
          if (counts(slot) > maxCount) maxCount = counts(slot)
          placed = true
        } else slot = (slot + 1) & mask
      }
      i += 1
    }
    new GenericArrayData(Array(n.toLong, distinct, maxCount.toLong))
  }

  override def nullSafeEval(arr: Any): Any = compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multExpr", this, classOf[MultiplicityStats].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash Jaccard estimator: the fraction of positions where two k-min
  * signatures agree. The interpreted form — aggregate(zip_with(a, b, ...))
  * — pays lambda dispatch per position per pair; this is one tight codegen
  * loop, the same trade every other per-row×k kernel in this package makes.
  * Unequal lengths (signatures from different k) are a caller bug: the
  * estimator would silently be meaningless, so it throws. */
case class SigAgreement(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sig_agreement"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sig_agreement requires two array<long> signatures, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  // getLong on a null element reads an undefined value — when the STATIC
  // type admits null elements (e.g. any parquet-read array: the reader
  // reinflates containsNull=true even for required elements), each read is
  // null-checked and fails loudly instead of returning a garbage score.
  // containsNull=false inputs skip the checks entirely.
  @transient private lazy val mayHaveNulls: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    }
  }

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"sig_agreement: signature lengths differ ($n vs ${b.numElements()}) — " +
        "the sides were minhashed with different k")
    if (n == 0) return 0.0
    val checkNulls = mayHaveNulls
    var eq = 0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i)))
        throw new IllegalArgumentException(
          s"sig_agreement: null signature element at position $i")
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigAgreeExpr", this, classOf[SigAgreement].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): Expression =
    copy(left = l, right = r)
}

/** Sorted-merge intersection count over two sorted distinct long arrays
  * (e.g. [[ShingleHashesExpr]] output, which is sorted-distinct by
  * construction). Sortedness is the CALLER's contract — a merge over
  * unsorted input undercounts silently, so keep the inputs to expressions
  * that guarantee order. One pass, no allocation, codegen-friendly. */
case class SortedIntersectCount(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<long> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  // the merge reads elements with getLong: a null element would read an
  // undefined value and return a garbage count SILENTLY. When the static
  // type admits nulls (e.g. parquet-read arrays, whose reader reinflates
  // containsNull=true), every read is null-checked and fails loudly;
  // containsNull=false inputs (shingle_hashes et al.) skip the checks.
  @transient private lazy val mayHaveNulls: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    }
  }

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    val checkNulls = mayHaveNulls
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(j)))
        throw new IllegalArgumentException(
          "sorted_intersect_count: null array element — the sorted-distinct " +
            "input contract excludes nulls; filter(x -> x IS NOT NULL) first")
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedIsectExpr", this,
      classOf[SortedIntersectCount].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): Expression =
    copy(left = l, right = r)
}

case class LshBuckets(child: Expression, nTables: Int, nPlanes: Int)
    extends UnaryExpression {
  // nPlanes >= 64 would wrap `1L << pl` (shift count mod 64), silently
  // duplicating plane bits; non-positive values yield meaningless buckets
  require(nTables >= 1 && nPlanes >= 1 && nPlanes <= 63,
    s"lsh_buckets requires nTables >= 1 and nPlanes in [1, 63], got " +
      s"nTables=$nTables nPlanes=$nPlanes")
  override def prettyName: String = "lsh_buckets"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<float>/array<double>, got ${other.simpleString}")
  }

  // lazy: child may be unresolved at construction (dataType would throw)
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** ±1 weight for (table, plane, dim): one xxh64 of the packed ids — no RNG
    * state, identical on every executor. */
  @inline private def weight(table: Int, plane: Int, dim: Int): Double = {
    val key = (table.toLong * 131071L + plane) * 1000003L + dim
    if ((XXH64.hashLong(key, 42L) & 1L) == 0L) 1.0 else -1.0
  }

  def compute(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var pl = 0
      while (pl < nPlanes) {
        var proj = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          proj += x * weight(t, pl, i)
          i += 1
        }
        if (proj >= 0) bucket |= (1L << pl)
        pl += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(arr: Any): Any = compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[LshBuckets].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
