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
}
