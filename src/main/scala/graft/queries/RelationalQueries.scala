package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import Exact._

/** Batch relational core — SURVEY.md §2.3-2.8 (projections, filters, joins,
  * aggregations, sorts/limits, set ops) re-expressed on the fixture tables.
  *
  * Scale notes (100 TB thinking):
  *  - q1/q3: partial (map-side) aggregation happens automatically for
  *    hash aggregates — the shuffle carries pre-aggregated rows.
  *  - q3: nation/region/customer are dimension tables — `broadcast()` keeps
  *    the big fact-side join shuffle-free.
  *  - q4/q5: anti/semi joins keep only the key column of the right side
  *    (column pruning), so the build side stays small.
  *  - q8: ORDER BY + LIMIT plans as TakeOrderedAndProject — a distributed
  *    top-k, never a full sort.
  */
object RelationalQueries extends QueryModule {

  /** TPC-H Q1-shaped pricing summary (SURVEY A1-A3 aggregate family). */
  private def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsumProduct($"l_extendedprice", lit(1.0) - $"l_discount").as("sum_disc_price"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filtered projection (P1/P2/S6/S7) — filter + pruning pushed to parquet. */
  private def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_discount" > 0.05 && $"l_quantity" < 10.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val q2Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05 AND l_quantity < 10.0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Star join + agg (J1): revenue per nation; dims broadcast. */
  private def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders   = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation   = Tables.nation(spark, dir)
    orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        dsum($"o_totalprice").as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"))
      .orderBy($"n_name")
  }

  private val q3Sql =
    s"""SELECT n_name,
       |  ${sqlDsum("o_totalprice")} AS revenue,
       |  COUNT(*) AS n_orders,
       |  COUNT(DISTINCT o_custkey) AS n_customers
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  /** Left-anti join (J2/K1 semantics): customers with no urgent order.
    * This is the set-oriented core of the reference's
    * INSERT .. ON CONFLICT DO NOTHING write path. */
  private def q4LeftAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.customer(spark, dir)
    val urgent = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_custkey"))
    customer.join(urgent, Seq("c_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val q4Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Left-semi join: customers holding at least one open ('O') order. */
  private def q5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.customer(spark, dir)
    val open = Tables.orders(spark, dir)
      .filter($"o_orderstatus" === "O")
      .select($"o_custkey".as("c_custkey"))
    customer.join(open, Seq("c_custkey"), "left_semi")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  private val q5Sql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Max-per-group (A1, the reference's resume-cursor in set form). */
  private def q6MaxPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        date_format(max($"o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("last_order_ts"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }

  private val q6Sql =
    """SELECT o_custkey,
      |  strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order_ts,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Top-1 row per key by event time (W3/O1) — whole-row variant of q6. */
  private def q7Top1PerKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Both engines read o_orderdate at microsecond precision, so ordering by
    // the timestamp itself is cross-engine deterministic (o_orderkey breaks
    // exact-microsecond ties).
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("order_ts"),
        $"o_totalprice")
      .orderBy($"o_custkey")
  }

  private val q7Sql =
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
      |  o_totalprice
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin

  /** Global top-k (O1): plans as TakeOrderedAndProject, not a full sort. */
  private def q8TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
  }

  private val q8Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Union of two filtered branches with a provenance tag (SURVEY §2.8). */
  private def q9Union(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
    val errors  = e.filter($"event_type" === "error")
      .select($"event_id", $"user_id", lit("err").as("bucket"))
    val signups = e.filter($"event_type" === "signup")
      .select($"event_id", $"user_id", lit("sig").as("bucket"))
    errors.union(signups).orderBy($"event_id")
  }

  private val q9Sql =
    """SELECT event_id, user_id, 'err' AS bucket FROM events WHERE event_type = 'error'
      |UNION ALL
      |SELECT event_id, user_id, 'sig' AS bucket FROM events WHERE event_type = 'signup'
      |ORDER BY event_id""".stripMargin

  /** Grouped top-k (rank <= 3 orders per customer by price). */
  private def q10TopKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
  }

  private val q10Sql =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Equi-width histogram of order totals (20 bins over the global
    * [min, max]): the profiling/distribution shape `width_bucket` serves.
    * The global extremes come from ONE tiny aggregate broadcast against
    * the scan (no second full pass through a window); the bin expression
    * is the SAME IEEE double arithmetic in both engines — identical
    * inputs, identical op order → identical bins, no boundary drift. */
  private def q130Histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val mm = orders.agg(
      min($"o_totalprice").as("mn"), max($"o_totalprice").as("mx"))
    orders.join(broadcast(mm))
      .withColumn("bin",
        least(floor((($"o_totalprice" - $"mn") * lit(20.0)) / ($"mx" - $"mn")),
          lit(19L)))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("mass"))
      .orderBy($"bin")
  }

  private val q130Sql =
    s"""WITH mm AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders)
       |SELECT
       |  LEAST(CAST(FLOOR(((o_totalprice - mn) * 20.0) / (mx - mn)) AS BIGINT), 19) AS bin,
       |  COUNT(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS mass
       |FROM orders, mm
       |GROUP BY 1
       |ORDER BY bin""".stripMargin

  /** Pearson correlation between event value and the JSON `k` prop per
    * event type, computed from EXACT decimal moment sums (n, Σx, Σy, Σxy,
    * Σx², Σy²) — the distributed-correlation shape: one map-side-combined
    * aggregate carries five mergeable sums, and only the FINAL scalar
    * formula touches floats (identical IEEE ops both engines). `corr()`
    * built-ins stream in engine-specific order and can't cross-engine
    * hash; moments can. */
  private def q131CorrMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .filter($"k".isNotNull)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        dsum($"value").as("sx"),
        dsum($"k").as("sy"),
        dsumProduct($"value", $"k").as("sxy"),
        dsumProduct($"value", $"value").as("sxx"),
        dsumProduct($"k", $"k").as("syy"))
      .withColumn("corr_vk",
        ($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") * sqrt($"n" * $"syy" - $"sy" * $"sy")))
      .select($"event_type", $"n", $"corr_vk")
      .orderBy($"event_type")
  }

  private val q131Sql =
    """WITH e AS (
      |  SELECT event_type, value,
      |    CAST(json_extract_string(props, '$.k') AS INT) AS k
      |  FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(k AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(k AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sxy,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(k AS DECIMAL(18,4)) * CAST(k AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS syy
      |  FROM e GROUP BY event_type)
      |SELECT event_type, n,
      |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_vk
      |FROM m
      |ORDER BY event_type""".stripMargin

  /** First-significant-digit distribution of order totals (the Benford
    * audit shape fraud/data-quality screens run): the digit comes from the
    * INTEGER part via floor→bigint→string, never from float formatting —
    * double-to-string renderings differ across engines, integer ones
    * can't. */
  private def q132Benford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_totalprice" >= 1.0)
      .withColumn("digit", substring(floor($"o_totalprice").cast("string"), 1, 1))
      .groupBy($"digit")
      .agg(count(lit(1)).as("n"))
      .orderBy($"digit")
  }

  private val q132Sql =
    """SELECT SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
      |  COUNT(*) AS n
      |FROM orders
      |WHERE o_totalprice >= 1.0
      |GROUP BY 1
      |ORDER BY digit""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q130_histogram", q130Histogram, Some(q130Sql),
      "equi-width histogram of order totals (global-extremes broadcast)"),
    Q("q131_corr_moments", q131CorrMoments, Some(q131Sql),
      "Pearson correlation from exact decimal moment sums per event type"),
    Q("q132_benford", q132Benford, Some(q132Sql),
      "first-significant-digit (Benford) audit over order totals"),
    Q("q1_agg", q1Agg, Some(q1Sql), "TPC-H Q1-style pricing summary (A1-A3)"),
    Q("q2_filter_project", q2FilterProject, Some(q2Sql), "pushdown filter + projection (P1/P2)"),
    Q("q3_join_agg", q3JoinAgg, Some(q3Sql), "broadcast star join + agg (J1)"),
    Q("q4_left_anti", q4LeftAnti, Some(q4Sql), "anti join / upsert-ignore core (J2)"),
    Q("q5_semi_join", q5SemiJoin, Some(q5Sql), "semi join (EXISTS)"),
    Q("q6_max_per_group", q6MaxPerGroup, Some(q6Sql), "max-per-group resume cursor (A1/W1)"),
    Q("q7_top1_per_key", q7Top1PerKey, Some(q7Sql), "latest-row-per-key via row_number (W3)"),
    Q("q8_topk", q8TopK, Some(q8Sql), "global top-k (O1, TakeOrderedAndProject)"),
    Q("q9_union", q9Union, Some(q9Sql), "union of filtered branches (§2.8)"),
    Q("q10_topk_per_group", q10TopKPerGroup, Some(q10Sql), "grouped top-k (W3)"))
}
