package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star training-data op) expressed Spark-first; [[oracleSql]] holds
  * the DuckDB-equivalent SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    TimeSeriesQueries,
    TextQueries,
    SimilarityQueries,
    AdvancedQueries,
    MiningQueries)

  val allQueries: Seq[Q] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A fused slice of the engine's core plan shapes: scan → broadcast dim
    * join → filter → monthly revenue aggregate per market segment → top-3
    * most recent months per segment (window rank). */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.orders(spark, dir)
    val customer = graft.core.Tables.customer(spark, dir)
    val daily = orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderstatus") =!= "X")
      .groupBy(col("c_mktsegment"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("month").desc)
    daily.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("month"), col("revenue"), col("n_orders"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
