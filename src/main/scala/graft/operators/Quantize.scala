package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding vector hygiene for ANN pipelines: L2 norms and symmetric
  * int8 quantization (the storage format that cuts a 100 TB float corpus
  * to a quarter before IVF/LSH indexing).
  *
  * All of it is row-local arithmetic over the vector column — zero
  * shuffle; the plan is a map over the scan. Higher-order-function
  * lambdas (interpreted, not codegen) are the right tool HERE because the
  * pass is once-per-ingest over a column that parquet already stores
  * together; the hot repeated-probe paths (cosine top-k, IVF assignment)
  * keep their codegen expressions (VectorExpressions) per the bench
  * evidence that interpreted HOFs lose 3x there.
  *
  * Determinism contract (what makes the op oracle-checkable bit-for-bit):
  * every element is widened float→double BEFORE any arithmetic (exact),
  * accumulation runs left-to-right in array order, and the quantizer is
  * floor(x * 127/maxAbs + 0.5) — pure IEEE double ops every engine
  * reproduces, with no round-half-even ambiguity. */
object Quantize {

  private def d(x: Column): Column = x.cast("double")

  /** Sum of squares, left-to-right, in double. */
  private def sumSq(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => acc + d(x) * d(x))

  /** Largest |element| in double (0.0 for the all-zero/empty vector). */
  private def maxAbs(vec: Column): Column =
    aggregate(vec, lit(0.0d), (acc, x) => greatest(acc, abs(d(x))))

  /** Symmetric int8 code for one element given the vector's scale. */
  private def code(x: Column, scale: Column): Column =
    floor(d(x) * scale + lit(0.5d))

  /** Per-vector quantization summary:
    * (id, dim, l2_norm, max_abs, q_sum, q_zeros) — norms rounded to 6
    * decimals (the q28 oracle precedent), q_sum/q_zeros exact integers.
    * q_zeros (codes that collapsed to 0) is the quantization-loss signal:
    * a vector whose mass hides in a few huge components zeroes everything
    * else out. */
  def int8Stats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withMa = df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__ma", maxAbs(col("__v")))
    val scale = when(col("__ma") > 0.0d, lit(127.0d) / col("__ma"))
      .otherwise(lit(0.0d))
    withMa.select(
      col(idCol),
      size(col("__v")).as("dim"),
      round(sqrt(sumSq(col("__v"))), 6).as("l2_norm"),
      round(col("__ma"), 6).as("max_abs"),
      aggregate(col("__v"), lit(0.0d), (acc, x) => acc + code(x, scale))
        .cast("long").as("q_sum"),
      aggregate(col("__v"), lit(0L),
          (acc, x) => acc + when(code(x, scale) === 0.0d, 1L).otherwise(0L))
        .as("q_zeros"))
  }

  /** The int8 codes themselves (array<int>), for writing a quantized copy
    * of the corpus next to the float original. */
  def int8Codes(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withMa = df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__ma", maxAbs(col("__v")))
    val scale = when(col("__ma") > 0.0d, lit(127.0d) / col("__ma"))
      .otherwise(lit(0.0d))
    withMa.select(col(idCol),
      transform(col("__v"), x => code(x, scale).cast("int")).as("codes"),
      round(col("__ma"), 6).as("max_abs"))
  }
}
