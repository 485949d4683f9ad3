package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Skyline.frontier2D: equivalence with the quadratic definition on
  * random and adversarial point sets, tie semantics, null hygiene. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Quadratic reference: q survives iff no p dominates it. */
  private def brute(pts: Seq[(Long, Double, Int)]): Seq[Long] =
    pts.filter { q =>
      !pts.exists(p => p._2 >= q._2 && p._3 >= q._3 &&
        (p._2 > q._2 || p._3 > q._3))
    }.map(_._1).sorted

  private def run(pts: Seq[(Long, Double, Int)]): Seq[Long] =
    Skyline.frontier2D(pts.toDF("id", "x", "y"), "x", "y")
      .select($"id").collect().map(_.getLong(0)).toSeq.sorted

  test("matches the quadratic definition on a seeded random set") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 300L).map(i =>
      (i, (rnd.nextInt(50) / 10.0), rnd.nextInt(30)))
    assert(run(pts) === brute(pts))
  }

  test("duplicate frontier points are all kept; same-x lower-y is dominated") {
    val pts = Seq(
      (1L, 5.0, 10), (2L, 5.0, 10), // duplicates of a frontier point
      (3L, 5.0, 9),                 // same x, lower y → dominated
      (4L, 6.0, 5),                 // frontier (higher x, lower y)
      (5L, 4.0, 10))                // dominated by (5.0, 10)
    assert(run(pts) === Seq(1L, 2L, 4L))
    assert(run(pts) === brute(pts))
  }

  test("a single totally-dominating point collapses the frontier to itself") {
    val pts = Seq((1L, 9.0, 99), (2L, 1.0, 1), (3L, 8.0, 98))
    assert(run(pts) === Seq(1L))
  }

  test("null coordinates are dropped, not treated as comparable") {
    val df = Seq(
      (1L, Some(5.0), Some(10)),
      (2L, None, Some(99)),
      (3L, Some(9.0), None)
    ).toDF("id", "x", "y")
    val out = Skyline.frontier2D(df, "x", "y")
      .select($"id").collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L))
  }

  test("monotone staircase input is returned whole") {
    // strictly decreasing y as x increases: nothing dominates anything
    val pts = (1L to 20L).map(i => (i, i.toDouble, (21 - i).toInt))
    assert(run(pts) === (1L to 20L))
  }
}
