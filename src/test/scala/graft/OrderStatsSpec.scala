package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.OrderStats

class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sfDir)
    .select($"event_type", $"event_id", $"value").cache()

  private def naive(ps: Seq[Double]): Map[(String, Double), Double] = {
    val byType = events.as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    (for ((t, vs) <- byType; p <- ps) yield {
      val r = math.max(1L, math.ceil(p * vs.length.toDouble).toLong)
      (t, p) -> vs((r - 1).toInt)
    }).toMap
  }

  test("exactQuantiles == naive sorted-rank across p values and bin counts") {
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val expected = naive(ps)
    val got = OrderStats.exactQuantiles(events, "value", "event_type", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    assert(got === expected)
    // bins=2 forces nearly everything through the straddle path
    val coarse = OrderStats.exactQuantiles(events, "value", "event_type",
        Seq(0.5, 0.9), bins = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    assert(coarse === naive(Seq(0.5, 0.9)))
  }

  test("p=0 and p=1 hit the min and max; constant column degenerates safely") {
    val flat = Seq(("a", 1L, 7.5), ("a", 2L, 7.5), ("a", 3L, 7.5))
      .toDF("event_type", "event_id", "value")
    val q = OrderStats.exactQuantiles(flat, "value", "event_type", Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    assert(q === Map(0.0 -> 7.5, 0.5 -> 7.5, 1.0 -> 7.5))
    val mins = naive(Seq(0.0)); val maxs = naive(Seq(1.0))
    val byType = events.as[(String, Long, Double)].collect().groupBy(_._1)
    byType.foreach { case (t, rows) =>
      assert(mins((t, 0.0)) === rows.map(_._3).min)
      assert(maxs((t, 1.0)) === rows.map(_._3).max)
    }
  }

  test("partition-invariant; guards reject bad inputs") {
    val a = OrderStats.exactQuantiles(events, "value", "event_type", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val b = OrderStats.exactQuantiles(events.repartition(7), "value", "event_type", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(a === b)
    intercept[IllegalArgumentException] {
      OrderStats.exactQuantiles(events, "value", "event_type", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      OrderStats.exactQuantiles(events, "value", "event_type", Seq(1.5))
    }
    val withNaN = Seq(("a", 1L, 1.0), ("a", 2L, Double.NaN))
      .toDF("event_type", "event_id", "value")
    val e = intercept[Exception] {
      OrderStats.exactQuantiles(withNaN, "value", "event_type", Seq(0.5)).count()
    }
    assert(e.getMessage.contains("NaN") || e.getCause != null)
  }

  // ---- paretoClass -------------------------------------------------------

  /** Naive reference: global (units DESC, key ASC) running sum + class. */
  private def naivePareto(rows: Seq[(Long, Long)], aPct: Int = 80,
      bPct: Int = 95): Map[Long, (Long, String)] = {
    val total = rows.map(r => BigInt(r._2)).sum
    var cum = BigInt(0)
    rows.sortBy { case (k, w) => (-w, k) }.map { case (k, w) =>
      val before = cum
      cum += w
      val cls = if (before * 100 < total * aPct) "A"
        else if (before * 100 < total * bPct) "B" else "C"
      k -> (cum.toLong, cls)
    }.toMap
  }

  private def runPareto(rows: Seq[(Long, Long)], bins: Int = 64,
      parts: Int = 1): Map[Long, (Long, String)] =
    OrderStats.paretoClass(
        rows.toDF("key", "units").repartition(parts), "key", "units",
        bins = bins)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap

  test("paretoClass == naive global running sum on a seeded random frame") {
    val rnd = new scala.util.Random(42)
    // heavy tail + duplicate weights + zero weights — every tie shape
    val rows = (1L to 500L).map(k =>
      k -> (if (k % 50 == 0) 0L else math.abs(rnd.nextLong() % 1000) *
        (if (k % 7 == 0) 1000L else 1L)))
    for (bins <- Seq(2, 16, 64))
      assert(runPareto(rows, bins) === naivePareto(rows), s"bins=$bins")
  }

  test("paretoClass: heaviest key is always A; boundary classes exact") {
    val rows = Seq(1L -> 790L, 2L -> 100L, 3L -> 60L, 4L -> 30L, 5L -> 20L)
    val got = runPareto(rows)
    assert(got(1L)._2 === "A") // before = 0
    assert(got(2L)._2 === "A") // before = 790: 79000 < 80000
    assert(got(3L)._2 === "B") // before = 890: 80000 <= 89000 < 95000
    assert(got(4L)._2 === "C") // before = 950: exactly 95% — strict cut
    assert(got(5L)._2 === "C")
    assert(got(1L)._1 === 790L && got(3L)._1 === 950L)
    assert(got === naivePareto(rows))
  }

  test("paretoClass: partition-invariant, uniform-weight degenerate, empty") {
    val rows = (1L to 200L).map(k => k -> (k % 13) * 10L)
    assert(runPareto(rows, parts = 1) === runPareto(rows, parts = 11))
    val uniform = (1L to 50L).map(_ -> 5L)
    assert(runPareto(uniform) === naivePareto(uniform))
    assert(runPareto(Seq.empty[(Long, Long)]) === Map.empty)
    val neg = Seq(1L -> 5L, 2L -> -1L).toDF("key", "units")
    val e = intercept[Exception] {
      OrderStats.paretoClass(neg, "key", "units").count()
    }
    assert(e.getMessage.contains("negative") || e.getCause != null)
  }
}
