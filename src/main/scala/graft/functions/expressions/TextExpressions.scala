package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Unicode-level text kernels Spark has no builtin for. */
object TextExpressions {

  /** Unicode NFC (canonical composition) of a string column — the
    * normalization a dedup/fingerprint pipeline applies before hashing so
    * that "é" (one code point) and "e"+U+0301 (two) collide. NFC, not
    * NFKC: compatibility folding (fullwidth → ASCII, ligature expansion)
    * CHANGES content and is a corpus-policy decision; canonical
    * composition is always content-preserving. Mirrors DuckDB's
    * `nfc_normalize`, which keeps the whole normalization chain
    * oracle-checkable. */
  def nfc_normalize(text: Column): Column = column(NfcNormalize(expression(text)))

  /** Jaro–Winkler similarity in [0, 1] — see [[JaroWinkler]]. */
  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))

  /** Per-codepoint occurrence counts of a string, sorted by codepoint —
    * the row-local half of character-entropy quality signals (gibberish,
    * base64 blobs, and single-char runs have extreme char distributions;
    * the classic cheap filter next to the Gopher word-level gates). One
    * pass, one small map, no explode of the text itself — downstream
    * aggregation explodes ~distinct-chars rows per doc (≈ alphabet size,
    * bounded), never per-character rows. */
  def char_counts(text: Column): Column = column(CharCounts(expression(text)))

  /** DEFLATE compression ratio (compressed bytes / raw UTF-8 bytes) of a
    * string — the other classic cheap gibberish detector: highly
    * repetitive text compresses far below ~0.4, random/base64 text sits
    * near 1.0 (CCNet/RefinedWeb-adjacent pipelines gate on both tails).
    * Deterministic within a JVM (fixed level, no dictionary) but the
    * byte stream is implementation-specific, so there is NO cross-engine
    * oracle for the value — [[char_counts]]'s entropy (q112) is the
    * oracled companion; this one is spec-bounded. Empty string → 1.0 by
    * convention (nothing to compress, nothing saved). */
  def deflate_ratio(text: Column): Column = column(DeflateRatio(expression(text)))
}

/** [[TextUtil.nfc]] as a codegen'd unary expression: normalization sits in
  * front of per-document hashing in the dedup hot path, so it must not
  * break the whole-stage-codegen span the hash kernels live in. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.expressions.TextUtil.nfc($v)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[TextUtil.charCounts]] as a codegen'd unary expression: one pass over
  * the string's codepoints into a sorted count array, evaluated inside
  * whole-stage codegen next to the other per-doc quality kernels. */
case class CharCounts(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_counts"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_counts requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextUtil.charCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.expressions.TextUtil.charCounts($v)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [[TextUtil.deflateRatio]] as a codegen'd unary expression — a real
  * per-row byte kernel (one Deflater pass), the same tier as the
  * image/audio decode kernels. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def prettyName: String = "deflate_ratio"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextUtil.deflateRatio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.expressions.TextUtil.deflateRatio($v)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaro–Winkler similarity of two strings in [0, 1] — the standard
  * entity-resolution metric beside levenshtein (FuzzyJoin): Jaro match/
  * transposition scoring plus the Winkler common-prefix boost (p = 0.1,
  * prefix ≤ 4, boost only above 0.7 — the classical parameters, which
  * are also DuckDB's `jaro_winkler_similarity`, so an oracle can replay
  * the score). Convention notes pinned by spec: two empty strings score
  * 0.0 (DuckDB's convention — "no evidence", not "perfect match");
  * scoring is per Java char (the BMP-centric classic definition).
  * O(len_a · window) time, zero allocation beyond two bitsets. */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "jaro_winkler"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two strings, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextUtil.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.TextUtil.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TextUtil {
  /** Static kernel behind [[JaroWinkler]] (public: codegen'd Java calls
    * it directly). */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (l < maxPrefix && a.charAt(l) == b.charAt(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }

  /** NFC-normalize; the already-normalized fast path (the overwhelmingly
    * common case for real corpora) returns the INPUT UTF8String — no
    * string conversion, no allocation. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** One pass over the string's CODEPOINTS (surrogate pairs count once,
    * matching DuckDB's character semantics) into per-codepoint counts,
    * emitted sorted by codepoint for a deterministic array. */
  def charCounts(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val m = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = m.get(cp)
      if (slot == null) m.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
    }
    val out = new Array[Long](m.size)
    val it = m.values().iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next()(0); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One DEFLATE pass (level 6, no dictionary) over the string's UTF-8
    * bytes; compressed/raw size ratio. A fresh Deflater per call — the
    * object is cheap relative to the compression work, and codegen call
    * sites are static (no per-task state to manage or leak). */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }
}
