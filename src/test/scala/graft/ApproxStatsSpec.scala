package graft

import org.apache.spark.sql.functions._

class ApproxStatsSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct count within 5% of exact; approx p50 within data range") {
    val events = graft.core.Tables.events(spark, sfDir)
    val rows = events.groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", 0.02).as("approx"),
        percentile_approx($"value", lit(0.5), lit(10000)).as("p50"),
        expr("percentile(value, 0.5)").as("exact_p50"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
      val p50 = r.getAs[Double]("p50")
      val exactP50 = r.getAs[Double]("exact_p50")
      // percentile_approx with high accuracy should be very close to exact
      assert(math.abs(p50 - exactP50) <= math.abs(exactP50) * 0.05 + 1.0,
        s"${r.getString(0)}: p50 $p50 vs exact $exactP50")
    }
  }
}
