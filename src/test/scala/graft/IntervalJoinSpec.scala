package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sfDir).cache()

  private def clicks = events.filter($"event_type" === "click")
    .select($"event_id".as("click_id"), $"user_id".as("cu"), $"ts".as("cts"))
  private def views = events.filter($"event_type" === "view")
    .select($"event_id".as("view_id"), $"user_id".as("vu"), $"ts".as("vts"))

  /** Reference formulation: plain theta join (fine at spec scale). */
  private def naive(lowerSec: Long, upperSec: Long) =
    clicks.join(views, $"cu" === $"vu" &&
        $"vts" >= timestamp_add("SECOND", lit(lowerSec), $"cts") &&
        $"vts" < timestamp_add("SECOND", lit(upperSec), $"cts"))
      .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet

  test("binned join == theta join across window shapes on the fixture") {
    // past-only, straddling-zero, future-only, and a tiny window
    for ((lo, hi) <- Seq((-21600L, 0L), (-3600L, 3600L), (0L, 7200L), (-61L, -1L))) {
      val got = IntervalJoin.joinWithin(clicks, views, "cu", "vu", "cts", "vts", lo, hi)
        .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
      assert(got === naive(lo, hi), s"window [$lo, $hi)")
    }
  }

  test("boundary semantics: lower inclusive, upper exclusive, sub-second exact") {
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq((1L, 7L, ts("2024-01-01 12:00:00.5")))
      .toDF("click_id", "cu", "cts")
    val r = Seq(
      (10L, 7L, ts("2024-01-01 11:00:00.5")),   // exactly lower bound: kept
      (11L, 7L, ts("2024-01-01 11:00:00.499999")), // 1 us before lower: dropped
      (12L, 7L, ts("2024-01-01 12:00:00.499999")), // 1 us before upper: kept
      (13L, 7L, ts("2024-01-01 12:00:00.5")),   // exactly upper bound: dropped
      (14L, 8L, ts("2024-01-01 11:30:00.0")))   // wrong key: dropped
      .toDF("view_id", "vu", "vts")
    val got = IntervalJoin.joinWithin(l, r, "cu", "vu", "cts", "vts", -3600L, 0L)
      .select($"view_id").as[Long].collect().toSet
    assert(got === Set(10L, 12L))
  }

  test("null timestamps on either side produce no pairs") {
    val l = Seq((1L, 7L, Option(Timestamp.valueOf("2024-01-01 12:00:00"))),
        (2L, 7L, Option.empty[Timestamp]))
      .toDF("click_id", "cu", "cts")
    val r = Seq((10L, 7L, Option(Timestamp.valueOf("2024-01-01 11:59:00"))),
        (11L, 7L, Option.empty[Timestamp]))
      .toDF("view_id", "vu", "vts")
    val got = IntervalJoin.joinWithin(l, r, "cu", "vu", "cts", "vts", -3600L, 0L)
    assert(got.select($"click_id", $"view_id").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 10L)))
  }

  test("unkeyed joinWithinAll == theta join; still an equi-join on the bin") {
    def naiveAll(lo: Long, hi: Long) =
      clicks.join(views,
          $"vts" >= timestamp_add("SECOND", lit(lo), $"cts") &&
          $"vts" < timestamp_add("SECOND", lit(hi), $"cts"))
        .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
    // narrow windows keep the unkeyed cross density testable
    for ((lo, hi) <- Seq((-300L, 0L), (-60L, 60L), (0L, 120L))) {
      val df = IntervalJoin.joinWithinAll(clicks, views, "cts", "vts", lo, hi)
      val got = df.select($"click_id", $"view_id").as[(Long, Long)].collect()
      assert(got.toSet === naiveAll(lo, hi), s"window [$lo, $hi)")
      assert(got.length === got.toSet.size, s"window [$lo, $hi): duplicate pairs")
    }
    val plan = IntervalJoin.joinWithinAll(clicks, views, "cts", "vts", -300L, 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      plan.take(2000))
  }

  test("plans as an equi-join on (key, bin) — never a nested-loop product") {
    val plan = IntervalJoin.joinWithin(clicks, views, "cu", "vu", "cts", "vts",
      -21600L, 0L).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan.take(2000))
  }

  test("a bot user's hot (key, bin) bucket is AQE skew-split, results exact") {
    // the Scaladoc claims skewed (key, bin) buckets are ordinary join skew
    // handled by AQE splitting — prove it: plant one user whose events all
    // land in ONE bin (a bot hammering inside a single window span) and
    // assert the adaptive plan split the skewed partition AND the result
    // still equals the theta join.
    //
    // newSession(): same SparkContext, PRIVATE SQLConf — the aggressive
    // skew thresholds must not leak into concurrently-running suites.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    val base = Timestamp.valueOf("2024-03-01 06:30:00")
    def at(sec: Long) = new Timestamp(base.getTime + sec * 1000)
    // bot: 20k right events inside one hour (w = 3600 -> one bin);
    // 40 normal users with 20 events each spread over a week
    val bot = (0 until 20000).map(i => (100000L + i, 1L, at(i % 3600)))
    val normal = for (u <- 2 to 41; i <- 0 until 20)
      yield (200000L + u * 100 + i, u.toLong, at(i * 86400L / 20 + u))
    val rights = (bot ++ normal).toDF("view_id", "vu", "vts")
    // left probes: 30 bot clicks in the same hour + 5 per normal user
    val lefts = ((0 until 30).map(i => (300000L + i, 1L, at(i * 120))) ++
      (for (u <- 2 to 41; i <- 0 until 5)
        yield (400000L + u * 10 + i, u.toLong, at(i * 86400L / 5)))
      ).toDF("click_id", "cu", "cts")
    val joined = IntervalJoin.joinWithin(lefts, rights, "cu", "vu", "cts", "vts",
        -3600L, 0L)
      .select($"click_id", $"view_id").as[(Long, Long)]
    val got = joined.collect()
    val expected = lefts.join(rights, $"cu" === $"vu" &&
        $"vts" >= timestamp_add("SECOND", lit(-3600L), $"cts") &&
        $"vts" < $"cts")
      .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
    assert(got.toSet === expected, "skew-split must not change the result")
    assert(got.length === got.toSet.size, "skew-split must not duplicate pairs")
    // the executed adaptive plan really did split the hot bucket
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      "expected AQE to mark the skewed (key, bin) join split:\n" + plan.take(3000))
  }

  test("rejects empty windows and colliding column names") {
    intercept[IllegalArgumentException] {
      IntervalJoin.joinWithin(clicks, views, "cu", "vu", "cts", "vts", 5L, 5L)
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.joinWithin(clicks, clicks, "cu", "cu", "cts", "cts", -5L, 5L)
    }
  }
}
