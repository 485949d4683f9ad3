package graft

import org.apache.spark.sql.types._
import graft.core.Tables

/** Fixture-schema canary (VERDICT r7 item 2, extended r9).
  *
  * Round 7 lost four queries and three tests because a driver-side fixture
  * regeneration silently changed `events.ts` from TIMESTAMP(NANOS) to
  * `timestamp[us]` without the UTC flag (Spark: TIMESTAMP_NTZ), and the
  * breakage surfaced as scattered `unix_micros` analysis crashes. This spec
  * makes the next such change fail in ONE obvious place: it loads EVERY
  * table through the same `Tables` entry points the queries use, at ALL
  * THREE fixture scale factors (the r7 regression could just as well have
  * hit only the sf the driver re-generated), and pins the engine-facing
  * schema. Schema-only reads — the sf0.1 sweep costs milliseconds.
  *
  * Timestamp columns accept either flavor (TIMESTAMP / TIMESTAMP_NTZ) where
  * the engine is genuinely agnostic — under the pinned UTC session timezone
  * the two render identical values — but `Tables.events` must ALWAYS hand
  * back a true TimestampType `ts`, whatever the parquet carries, because
  * the rolling/funnel/anomaly operators feed it to `unix_micros`.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val anyTs: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private val allSfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** name -> (required type set; singleton = exact pin), asserted at every
    * fixture scale factor. */
  private def pin(load: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
      table: String, expected: Seq[(String, Set[DataType])]): Unit =
    for (dir <- allSfDirs) {
      val actual = load(spark, dir).schema.fields.map(f => f.name -> f.dataType)
      assert(actual.map(_._1).toSeq == expected.map(_._1),
        s"$table[$dir] columns changed: got ${actual.map(_._1).mkString(",")}")
      expected.zip(actual).foreach { case ((name, ok), (_, got)) =>
        assert(ok.contains(got),
          s"$table[$dir].$name: expected one of ${ok.mkString("/")}, fixture now reads as $got")
      }
    }

  private def exact(t: DataType): Set[DataType] = Set(t)

  test("region/nation: dimension schemas") {
    pin(Tables.region, "region",
      Seq("r_regionkey" -> exact(IntegerType), "r_name" -> exact(StringType)))
    pin(Tables.nation, "nation",
      Seq("n_nationkey" -> exact(IntegerType), "n_name" -> exact(StringType),
        "n_regionkey" -> exact(IntegerType)))
  }

  test("customer/supplier/part: dimension schemas") {
    pin(Tables.customer, "customer",
      Seq("c_custkey" -> exact(LongType), "c_name" -> exact(StringType),
        "c_nationkey" -> exact(IntegerType), "c_acctbal" -> exact(DoubleType),
        "c_mktsegment" -> exact(StringType)))
    pin(Tables.supplier, "supplier",
      Seq("s_suppkey" -> exact(LongType), "s_name" -> exact(StringType),
        "s_nationkey" -> exact(IntegerType), "s_acctbal" -> exact(DoubleType)))
    pin(Tables.part, "part",
      Seq("p_partkey" -> exact(LongType), "p_name" -> exact(StringType),
        "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
        "p_size" -> exact(IntegerType), "p_retailprice" -> exact(DoubleType)))
  }

  test("orders/lineitem: fact schemas (date columns may be either ts flavor)") {
    pin(Tables.orders, "orders",
      Seq("o_orderkey" -> exact(LongType), "o_custkey" -> exact(LongType),
        "o_orderstatus" -> exact(StringType), "o_totalprice" -> exact(DoubleType),
        "o_orderdate" -> anyTs, "o_orderpriority" -> exact(StringType)))
    pin(Tables.lineitem, "lineitem",
      Seq("l_orderkey" -> exact(LongType), "l_partkey" -> exact(LongType),
        "l_suppkey" -> exact(LongType), "l_linenumber" -> exact(IntegerType),
        "l_quantity" -> exact(DoubleType), "l_extendedprice" -> exact(DoubleType),
        "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
        "l_returnflag" -> exact(StringType), "l_linestatus" -> exact(StringType),
        "l_shipdate" -> anyTs))
  }

  test("events: Tables.events normalizes ts to TimestampType at every sf") {
    pin(Tables.events, "events",
      Seq("event_id" -> exact(LongType), "ts" -> exact(TimestampType),
        "user_id" -> exact(LongType), "event_type" -> exact(StringType),
        "value" -> exact(DoubleType), "props" -> exact(StringType)))
  }

  test("events: unix_micros works on the normalized ts (the r7 crash shape)") {
    import org.apache.spark.sql.functions._
    // This is exactly the call that crashed q12/q13/q98/q106 in round 7.
    val n = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts"))).filter(col("unix_micros(ts)").isNotNull).count()
    assert(n > 0)
  }

  test("documents/embeddings: LLM-pipeline table schemas") {
    pin(Tables.documents, "documents",
      Seq("doc_id" -> exact(LongType), "text" -> exact(StringType),
        "lang" -> exact(StringType), "source" -> exact(StringType),
        "n_chars" -> exact(LongType)))
    pin(Tables.embeddings, "embeddings",
      Seq("vec_id" -> exact(LongType),
        "embedding" -> exact(ArrayType(FloatType, containsNull = true)),
        "label" -> exact(IntegerType)))
  }

  test("graph/spatial key columns: the q108-q170 waves' join keys stay 8-byte") {
    // The graph operators exchange (long, long) edges built from these
    // columns; the spatial queries derive integer coordinates from doc_id.
    // A fixture regen that widened/narrowed any of them would silently
    // change every hash partitioning — pin the exact types in one place.
    for (dir <- allSfDirs) {
      val l = Tables.lineitem(spark, dir).schema
      assert(l("l_orderkey").dataType == LongType
        && l("l_partkey").dataType == LongType
        && l("l_suppkey").dataType == LongType, s"lineitem keys[$dir]: $l")
      val o = Tables.orders(spark, dir).schema
      assert(o("o_orderkey").dataType == LongType
        && o("o_custkey").dataType == LongType, s"orders keys[$dir]: $o")
      assert(Tables.documents(spark, dir).schema("doc_id").dataType == LongType,
        s"documents.doc_id[$dir]")
      assert(Tables.events(spark, dir).schema("user_id").dataType == LongType,
        s"events.user_id[$dir]")
    }
  }
}
