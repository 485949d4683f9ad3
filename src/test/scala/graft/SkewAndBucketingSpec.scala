package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Skew
import graft.sinks.Bucketing

class SkewAndBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join result") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
      .select($"c_custkey".as("o_custkey"), $"c_name")
    val plain = orders.join(customer, "o_custkey")
      .select($"o_orderkey", $"c_name")
    val salted = Skew.saltedJoin(orders, customer, key = "o_custkey",
        rowIdCol = "o_orderkey", saltFactor = 8)
      .select($"o_orderkey", $"c_name")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt spreads a hot key over multiple salt values") {
    // one pathological key repeated 1000x
    val hot = (1 to 1000).map(i => (7L, i.toLong)).toDF("k", "row_id")
    val salted = hot.withColumn("__salt",
      pmod(xxhash64($"row_id"), lit(8)).cast("int"))
    val nSalts = salted.select("__salt").distinct().count()
    assert(nSalts === 8, s"hot key spread over $nSalts salt buckets")
  }

  test("co-bucketed join has no Exchange in the physical plan") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.orders(spark, sfDir), "b_orders",
        "o_custkey", nBuckets = 8, sortCol = Some("o_custkey"))
      Bucketing.writeBucketed(
        Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", "o_custkey", nBuckets = 8, sortCol = Some("o_custkey"))
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(1500)}")
      // and it's still the right answer
      assert(joined.count() ===
        Tables.orders(spark, sfDir).join(
          Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "o_custkey"),
          "o_custkey").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
  test("groupBy on the bucket key aggregates without an exchange") {
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity"),
        "b_li_agg", "l_orderkey", nBuckets = 8)
      val agg = spark.table("b_li_agg")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-key groupBy must consume the bucketing:\n${plan.take(1500)}")
      val viaShuffle = Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
        .orderBy("l_orderkey").collect()
      assert(agg.orderBy("l_orderkey").collect().sameElements(viaShuffle))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_li_agg")
    }
  }
}
