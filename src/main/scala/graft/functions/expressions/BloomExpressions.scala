package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Driver-built Bloom filter, inlined into the plan as expression state —
  * the membership-sketch counterpart of the IvfIndex centroid literal.
  *
  * Purpose: approximate-membership PREFILTERS whose misses are then
  * resolved exactly. A Bloom filter has NO false negatives, so
  * `filter(bloom_any(...))` keeps every truly-matching row; downstream
  * exact verification removes the false positives — the combined result
  * is exact (the q55 contamination path relies on precisely this).
  *
  * Scale rationale: a reference set of h 64-bit hashes costs 8h bytes to
  * broadcast as a join table but only ~2h bytes as bloom bits at 16
  * bits/element — and the membership probe is a row-LOCAL codegen call, so
  * the probing side needs no explode and no join operator at all until
  * the (rare) candidates reach verification.
  */
object BloomExpressions {

  /** Immutable bloom bits + hash count. `words` is the bit set packed into
    * longs; the bit count is a power of two so probes mask, not mod. */
  final case class Bloom(words: IndexedSeq[Long], numHashes: Int) {
    require(words.nonEmpty && (words.length & (words.length - 1)) == 0,
      s"bloom word count must be a power of two, got ${words.length}")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1, 16], got $numHashes")
    @transient private lazy val w: Array[Long] = words.toArray
    private def bitMask: Long = (words.length.toLong << 6) - 1

    // a case-class toString would dump every packed word into plan strings
    // and explain output; summarize instead
    override def toString: String =
      s"Bloom(${words.length << 6} bits, k=$numHashes)"

    def mightContain(x: Long): Boolean = {
      val arr = w
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(x, i) & bitMask
        if ((arr((h >>> 6).toInt) & (1L << (h & 63L).toInt)) == 0L) return false
        i += 1
      }
      true
    }
  }

  /** Build a bloom over 64-bit element hashes (e.g. shingle_hashes output).
    * Sizing: bit count = next power of two >= n * bitsPerElement (min 64);
    * hash count = the optimal ln2 * bits/n, clamped to [1, 16]. At the
    * default 16 bits/element the false-positive rate is ~4e-4. */
  def build(elements: Iterable[Long], bitsPerElement: Int = 16): Bloom = {
    require(bitsPerElement >= 1, s"bitsPerElement must be >= 1")
    val n = elements.size
    require(n > 0, "cannot build a bloom over zero elements")
    var bits = 64L
    while (bits < n.toLong * bitsPerElement) bits <<= 1
    val words = new Array[Long]((bits >>> 6).toInt)
    val k = math.max(1, math.min(16,
      math.round(math.log(2) * bits / n).toInt))
    val mask = bits - 1
    elements.foreach { x =>
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(x, i) & mask
        words((h >>> 6).toInt) |= (1L << (h & 63L).toInt)
        i += 1
      }
    }
    Bloom(scala.collection.immutable.ArraySeq.unsafeWrapArray(words), k)
  }

  /** True iff ANY element of the array<long> column might be in the bloom.
    * Codegen, row-local — the candidate test for prefilter pipelines. */
  def bloom_any(hashes: Column, bloom: Bloom): Column =
    column(BloomAny(expression(hashes), bloom))
}

/** Row-local "does any element hit the bloom" probe over array<long>. */
case class BloomAny(child: Expression, bloom: BloomExpressions.Bloom)
    extends UnaryExpression {
  override def prettyName: String = "bloom_any"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_any requires array<long> (e.g. shingle_hashes), got ${other.simpleString}")
  }

  def compute(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (bloom.mightContain(a.getLong(i))) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(arr: Any): Any = compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomAnyExpr", this, classOf[BloomAny].getName)
    defineCodeGen(ctx, ev, a => s"$ref.compute($a)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
