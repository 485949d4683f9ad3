package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join helpers.
  *
  * AQE's skew-join split (on by default in GraftSession) handles most skew
  * at runtime by splitting oversized partitions, but it only applies to
  * sort-merge joins and can't split a single pathological KEY. Salting
  * does: the skewed (large) side gets a random-but-deterministic salt in
  * [0, saltFactor); the small side is replicated saltFactor times; the join
  * key becomes (key, salt), spreading one hot key over saltFactor tasks.
  *
  * Cost model: replicates the SMALL side saltFactor x — use when one side
  * is modest and the other has hot keys (the classic fact-to-fact case
  * where broadcast doesn't fit and AQE splitting hits its per-partition
  * granularity limit).
  */
object Skew {

  /** Inner equi-join with salted keys. Deterministic: the salt derives from
    * xxhash64 of the large side's full row id column, not rand(). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      rowIdCol: String, saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(rowIdCol)), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top skewed keys by frequency — the diagnostic used to decide whether
    * salting (or key isolation) is needed. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
