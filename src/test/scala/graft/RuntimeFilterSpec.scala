package graft

import org.apache.spark.sql.functions._

/** Pins Spark's runtime bloom-filter injection (InjectRuntimeFilter) on
  * the engine's join shapes: when a selective filter sits on one side of
  * a shuffle join, the optimizer builds a bloom filter from the filtered
  * side and pushes a `might_contain` probe into the other side's scan —
  * at 100 TB this is the difference between scanning the whole fact
  * table and skipping most of it before the shuffle.
  *
  * The production thresholds (10 GB application-side scan) are sized for
  * clusters; here they drop to zero in an isolated session so the
  * mechanism itself is exercised at fixture scale. GraftSession leaves
  * the defaults alone — the pin is that the engine's plain declarative
  * joins are ELIGIBLE for injection, which this spec proves.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective filter on one join side injects a bloom probe into the other") {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // force the shuffle-join path: broadcast joins don't need the filter
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val sel = s.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      "expected an injected bloom-filter probe on the fact side:\n" +
        plan.take(3000))
    // and the result is unaffected by the probe
    val n = joined.head().getLong(0)
    val expected = li.join(sel.hint("broadcast"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(n === expected)
  }
}
