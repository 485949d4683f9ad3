package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) storage layout: sort multi-dimensional data
  * along a space-filling curve so parquet min/max footer stats prune
  * files for predicates on ANY of the interleaved columns — the
  * data-skipping complement to [[Bucketing]] (which serves equi-joins on
  * ONE key). A table range-sorted by `interleaveBits(user, day)` answers
  * both "one user's history" and "one day across users" reading a small
  * fraction of files, where a linear sort on either column serves only
  * that column.
  *
  * Scale shape: the key is a pure row-local bit-interleave (narrow map,
  * inside WSCG); the layout write is ONE range exchange + in-partition
  * sort — the same single-shuffle class as any partitioned write, paid
  * once at ETL time. No stats collection pass: the caller maps values
  * into [0, 2^bits) (truncate a timestamp, mask an id — rank-preserving
  * maps), which keeps the key engine-portable and the write one-pass.
  *
  * Determinism contract (what the q95 oracle pins): with n columns at
  * `bits` bits each, bit j of column c lands at key bit j·n + c —
  * LITTLE-endian interleave, column 0 in the lowest lane. Values outside
  * [0, 2^bits) fail the job loudly: silently masking would fold distant
  * values onto the same curve position and quietly destroy locality. */
object ZOrder {

  /** The Morton key: interleave the low `bits` bits of each column.
    * All inputs must be integral and in [0, 2^bits); n·bits <= 63. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "at least one column required")
    require(bits > 0, s"bits must be positive, got $bits")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a signed long")
    val n = cols.size
    val lim = 1L << bits
    val terms = cols.zipWithIndex.flatMap { case (c, ci) =>
      val v = when(c.isNull || c.cast("long") < 0 || c.cast("long") >= lim,
          raise_error(concat(
            lit(s"interleaveBits: value outside [0, $lim) in column $ci: "),
            coalesce(c.cast("string"), lit("null")))).cast("long"))
        .otherwise(c.cast("long"))
      (0 until bits).map { j =>
        shiftleft(shiftright(v, j).bitwiseAND(lit(1L)), j * n + ci)
      }
    }
    terms.reduce(_ + _)
  }

  /** Writes `df` z-ordered on `zCols`: one range repartition on the
    * Morton key + per-partition sort, so each output file covers a
    * contiguous curve segment — a small bounding box in EVERY interleaved
    * dimension (the property ZOrderSpec measures against a linear sort). */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], bits: Int,
      path: String, nFiles: Int): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.withColumn("__zkey", interleaveBits(zCols.map(col), bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
