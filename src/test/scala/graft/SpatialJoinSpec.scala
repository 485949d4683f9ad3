package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet

  private def run(pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    SpatialJoin.proximityPairs(pts.toDF("id", "x", "y"), "id", "x", "y", r)
      .as[(Long, Long, Long)].collect().toSet

  test("grid-blocked pairs == quadratic reference on seeded random clouds") {
    val rnd = new scala.util.Random(31)
    // mixed density incl. negative coordinates (floor-div tiling) and a
    // tight cluster that spans a cell corner
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextLong(2000) - 1000, rnd.nextLong(2000) - 1000)) ++
      (401L to 430L).map(i => (i, 95L + rnd.nextLong(10), 95L + rnd.nextLong(10)))
    for (r <- Seq(50L, 100L, 300L))
      assert(run(pts, r) === naive(pts, r), s"r=$r")
  }

  test("exact-radius boundary, duplicates, empties, guards") {
    // dist2 exactly r^2 is IN; one unit past is OUT
    val boundary = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 5L, 1L))
    assert(run(boundary, 5L) === naive(boundary, 5L))
    assert(run(boundary, 5L).contains((1L, 2L, 25L)))
    // coincident points pair at distance 0
    assert(run(Seq((1L, 7L, 7L), (2L, 7L, 7L)), 1L) === Set((1L, 2L, 0L)))
    assert(run(Seq.empty, 10L) === Set.empty)
    intercept[IllegalArgumentException] {
      SpatialJoin.proximityPairs(Seq((1L, 1L, 1L)).toDF("id", "x", "y"),
        "id", "x", "y", 0L)
    }
    // r^2 past the BIGINT dist2 contract is rejected, not wrapped
    intercept[IllegalArgumentException] {
      SpatialJoin.proximityPairs(Seq((1L, 1L, 1L)).toDF("id", "x", "y"),
        "id", "x", "y", 1L << 32)
    }
    // far-apart >2^53-domain coordinates: candidate distances overflow a
    // long but the decimal-side compare still answers exactly
    val big = 1L << 60
    assert(run(Seq((1L, big, big), (2L, big + 3L, big + 4L),
      (3L, -big, -big)), 5L) === Set((1L, 2L, 25L)))
    val withNull = Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(1L),
      null.asInstanceOf[java.lang.Long])).toDF("id", "x", "y")
    val e = intercept[Exception] {
      SpatialJoin.proximityPairs(withNull, "id", "x", "y", 5L).count()
    }
    assert(e.getMessage.contains("null") || e.getCause != null)
  }

  test("partition invariance and no quadratic shape in the plan") {
    val rnd = new scala.util.Random(5)
    val pts = (1L to 300L).map(i => (i, rnd.nextLong(1000), rnd.nextLong(1000)))
    val df = pts.toDF("id", "x", "y")
    val a = SpatialJoin.proximityPairs(df.repartition(1), "id", "x", "y", 60L)
      .as[(Long, Long, Long)].collect().toSet
    val b = SpatialJoin.proximityPairs(df.repartition(13), "id", "x", "y", 60L)
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
    val q = SpatialJoin.proximityPairs(df, "id", "x", "y", 60L)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "the proximity join must stay an equi-join on the cell key")
  }

  test("latLonToLocalMeters: scale factors, cos shrink, signed rounding") {
    def proj(lat: Double, lon: Double, ref: Double): (Long, Long) = {
      val (x, y) = SpatialJoin.latLonToLocalMeters(col("lat"), col("lon"), ref)
      Seq((lat, lon)).toDF("lat", "lon").select(x, y).as[(Long, Long)].head()
    }
    // one degree of latitude is R*pi/180 meters regardless of reference
    assert(proj(1.0, 0.0, 37.5)._2 === math.round(SpatialJoin.metersPerDegLat))
    assert(proj(-1.0, 0.0, 60.0)._2 === -math.round(SpatialJoin.metersPerDegLat))
    // the longitude circle shrinks by cos(refLat): half scale at 60 deg
    val x60 = proj(0.0, 1.0, 60.0)._1
    val x0 = proj(0.0, 1.0, 0.0)._1
    assert(math.abs(x60 * 2.0 - x0) <= 1.0, s"cos(60)=0.5 shrink: $x60 vs $x0")
    // meter-scale deltas survive the rounding: 0.001 deg lat ~ 111 m
    assert(proj(0.001, 0.0, 37.5)._2 === 111L)
    // poles are rejected (cos -> 0 collapses every longitude)
    intercept[IllegalArgumentException] {
      SpatialJoin.latLonToLocalMeters(col("lat"), col("lon"), 90.0)
    }
  }
}
