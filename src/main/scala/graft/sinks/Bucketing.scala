package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled storage so repeated joins/aggregations on
  * the bucket key skip their exchange entirely.
  *
  * The contract at scale: hash-partition ONCE at write time (the ETL's
  * final shuffle), then every downstream join on the same key and bucket
  * count is exchange-free — the single biggest repeated-cost saving for a
  * fact table joined daily. Both join sides must be bucketed with the same
  * count on the join key. */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Join two co-bucketed catalog tables on the bucket key. The physical
    * plan must show SortMergeJoin with NO Exchange on either side
    * (asserted in BucketingSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
