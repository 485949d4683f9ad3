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

  test("continuous x (every x distinct) matches brute at small bin counts") {
    // distinct-x == corpus size — the case the hierarchical prune exists
    // for; bins << n forces multi-candidate cells so BOTH the in-cell
    // window and the cross-cell running max do real work
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i => (i, rnd.nextDouble() * 100.0, rnd.nextInt(40)))
    for (bins <- Seq(1, 3, 8, 65536)) {
      val got = Skyline.frontier2D(pts.toDF("id", "x", "y"), "x", "y", bins)
        .select($"id").collect().map(_.getLong(0)).toSeq.sorted
      assert(got === brute(pts), s"bins=$bins")
    }
  }

  test("equal y in a strictly-greater cell dominates across the cell boundary") {
    // y' == y at larger x ⇒ dominated (x strict); the cross-cell max must
    // apply NON-strictly — a >= comparison bug would keep id 1
    val pts = Seq((1L, 1.0, 10), (2L, 99.0, 10))
    assert(run(pts) === Seq(2L))
    assert(run(pts) === brute(pts))
  }

  test("anti-correlated continuous input (worst case: everything survives)") {
    val pts = (1L to 300L).map(i => (i, i * 0.1, (1000 - i).toInt))
    val got = Skyline.frontier2D(pts.toDF("id", "x", "y"), "x", "y", 16)
      .select($"id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got === (1L to 300L))
  }

  test("non-numeric x is rejected (binning needs a numeric axis)") {
    val df = Seq(("a", 1)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Skyline.frontier2D(df, "x", "y")
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("plan pin: no unpartitioned window; the BoundedWindow-keyed cumulative " +
      "runs over the ≤bins cell aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val pts = (1L to 100L).map(i => (i, i * 0.37, (i % 13).toInt))
    val out = Skyline.frontier2D(pts.toDF("id", "x", "y"), "x", "y", 32)
    val wins = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected window nodes in the frontier plan")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "every window must carry a partition spec (real key or BoundedWindow's constant)")
    // the cross-cell cumulative rides BoundedWindow's constant key — the
    // analyzer extracts the pmod(xxhash64) expression into a `_wN` alias,
    // so the spec holds an extracted attribute rather than a plain column
    val bounded = wins.filter(_.partitionSpec.exists(
      _.references.exists(_.name.startsWith("_w"))))
    assert(bounded.size === 1,
      s"exactly one BoundedWindow-keyed window, got ${bounded.size}")
    // … and its input must be the per-cell aggregate (≤ bins rows), never raw data
    val boundedInput = bounded.head.child.collectFirst {
      case a: Aggregate if a.groupingExpressions.exists(_.toString.contains("__bin")) => a
    }
    assert(boundedInput.isDefined,
      "BoundedWindow-keyed window must consume the __bin cell aggregate:\n" + bounded.head)
    // and the data-sized candidate window is partitioned by a REAL key (the cell)
    assert(wins.exists(w => w.partitionSpec.nonEmpty &&
      !w.partitionSpec.exists(_.references.exists(_.name.startsWith("_w")))),
      "in-cell window must be partitioned by the cell key")
  }
}
