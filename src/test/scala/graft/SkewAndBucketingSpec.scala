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

  test("planted hot fact key: OptimizeSkewedJoin splits it, results == unskewed plan") {
    // SURVEY §4.2 leans on AQE skew splitting as the 100x answer for
    // ORDINARY equi-join skew (IntervalJoinSpec pins only the (key, bin)
    // shape) — prove the plain-join path too: plant one fact key carrying
    // ~100x the median partition's rows and assert (a) the adaptive plan
    // marked the sort-merge join skew-split, (b) the result is
    // bit-identical to the same join with AQE off.
    //
    // Shared data, built once; each session materializes its own frame
    // (DataFrames are session-bound).
    val factRows = (0 until 20000).map(i => (1L, i.toLong)) ++
      (for (k <- 2 to 41; i <- 0 until 200) yield (k.toLong, i.toLong))
    val dimRows = (1 to 41).flatMap(k => (0 until 3).map(j => (k.toLong, j.toLong)))

    // newSession(): private SQLConf — aggressive skew thresholds must not
    // leak into concurrently-running suites
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val skewed = {
      import s.implicits._
      s.createDataset(factRows).toDF("k", "i")
        .join(s.createDataset(dimRows).toDF("dk", "j"), $"k" === $"dk")
        .select($"k", $"i", $"j")
    }
    val got = skewed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val plan = skewed.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      "expected OptimizeSkewedJoin to split the hot fact key:\n" + plan.take(3000))

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val expected = {
      import s2.implicits._
      s2.createDataset(factRows).toDF("k", "i")
        .join(s2.createDataset(dimRows).toDF("dk", "j"), $"k" === $"dk")
        .select($"k", $"i", $"j")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    assert(got.length === expected.length, "skew split must not drop or duplicate rows")
    assert(got.toSet === expected.toSet, "skew split must not change the result")
  }
}
