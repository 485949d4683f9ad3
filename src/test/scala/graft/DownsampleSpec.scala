package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Downsample

/** Parallel LTTB downsampling: bucket/edge contract, spike preservation,
  * exact-arithmetic equivalence to a driver-side reference, invariance. */
class DownsampleSpec extends SparkSpec {
  import spark.implicits._

  private val W = 1000L // 1 s buckets for fixtures

  private def df(rows: Seq[(String, Long, Double)]): DataFrame =
    rows.map { case (k, ms, v) => (k, new Timestamp(ms), v) }
      .toDF("k", "ts", "v")

  private def run(rows: Seq[(String, Long, Double)]): Seq[(String, Long, Long, Long, Long)] =
    Downsample.lttb(df(rows), "k", "ts", "v", bucketMillis = W)
      .orderBy($"k", $"bucket")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("first bucket keeps its earliest point, last its latest") {
    val rows = Seq(
      ("a", 100L, 5.0), ("a", 900L, 9.0),          // bucket 0 (first)
      ("a", 1100L, 1.0), ("a", 1500L, 100.0),      // bucket 1 (interior)
      ("a", 2100L, 7.0), ("a", 2900L, 3.0))        // bucket 2 (last)
    val got = run(rows)
    assert(got.head === (("a", 0L, 100L, 5000000L, 2L)))
    assert(got.last === (("a", 2L, 2900L, 3000000L, 2L)))
  }

  test("interior bucket keeps the largest-triangle (spike) point") {
    // neighbors hover near y=5; the interior spike must win the argmax
    val rows = Seq(
      ("a", 100L, 5.0), ("a", 900L, 5.0),
      ("a", 1100L, 5.0), ("a", 1400L, 80.0), ("a", 1800L, 5.0),
      ("a", 2100L, 5.0), ("a", 2900L, 5.0))
    val mid = run(rows).find(_._2 == 1L).get
    assert(mid._3 === 1400L && mid._4 === 80000000L)
  }

  test("single-bucket key takes the first-bucket (earliest) rule") {
    val got = run(Seq(("a", 100L, 2.0), ("a", 900L, 9.0)))
    assert(got === Seq(("a", 0L, 100L, 2000000L, 2L)))
  }

  test("gap buckets skip: neighbors are the adjacent NON-EMPTY buckets") {
    // buckets 0, 5, 9 — bucket 5 is interior with neighbors 0 and 9
    val rows = Seq(
      ("a", 100L, 5.0),
      ("a", 5100L, 5.0), ("a", 5500L, 50.0),
      ("a", 9900L, 5.0))
    val got = run(rows)
    assert(got.map(_._2) === Seq(0L, 5L, 9L))
    assert(got.find(_._2 == 5L).get._3 === 5500L)
  }

  test("one row per populated bucket; n_points partitions the input") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (if (i % 2 == 0) "a" else "b",
        rnd.nextInt(20000).toLong, rnd.nextInt(1000) / 10.0)
    }
    val got = run(rows)
    assert(got.map(t => (t._1, t._2)).distinct.size === got.size)
    assert(got.map(_._5).sum === 500L)
    val buckets = rows.map(r => (r._1, r._2 / W)).distinct.size
    assert(got.size === buckets)
  }

  test("matches a driver-side reference of the same contract exactly") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      (if (i % 3 == 0) "a" else "b",
        rnd.nextInt(15000).toLong, rnd.nextInt(100000) / 100.0)
    }
    def q(v: Double): Long = math.floor(v * 1000000.0).toLong
    val ref = rows.groupBy(r => (r._1, r._2 / W)).toSeq
      .groupBy(_._1._1).flatMap { case (k, bs) =>
        val byB = bs.sortBy(_._1._2)
        val sums = byB.map { case ((_, b), ps) =>
          b -> (ps.size.toLong, ps.map(_._2).sum, ps.map(p => q(p._3)).sum)
        }
        byB.zipWithIndex.map { case (((_, b), ps), i) =>
          val pts = ps.map(p => (p._2, q(p._3)))
          val chosen =
            if (i == 0) pts.minBy(identity)
            else if (i == byB.size - 1) pts.maxBy(identity)
            else {
              val (pn, psx, psy) = sums(i - 1)._2
              val (nn, nsx, nsy) = sums(i + 1)._2
              def e(x: Long, y: Long): BigInt =
                (BigInt(psx) * nn * y - BigInt(psx) * nsy +
                  BigInt(x) * pn * nsy - BigInt(x) * nn * psy +
                  BigInt(nsx) * psy - BigInt(nsx) * pn * y).abs
              pts.map(p => (e(p._1, p._2), p)).sortBy { case (a, (x, y)) =>
                (-a, x, y)
              }.head._2
            }
          (k, b, chosen._1, chosen._2, ps.size.toLong)
        }
      }.toSeq.sortBy(t => (t._1, t._2))
    assert(run(rows) === ref)
  }

  test("selection is invariant to input partitioning") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map { i =>
      ("a", rnd.nextInt(12000).toLong, rnd.nextInt(500) / 5.0)
    }
    val base = df(rows)
    val a = Downsample.lttb(base, "k", "ts", "v", W)
    val b = Downsample.lttb(base.repartition(13), "k", "ts", "v", W)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("m4 emits the four extreme points with the documented tie contract") {
    val rows = Seq(
      // bucket 0: first at x=100, last at x=900, min y at (500, 1.0),
      // max y at (300, 9.0); tie on min y broken toward smaller x
      ("a", 100L, 5.0), ("a", 300L, 9.0), ("a", 500L, 1.0),
      ("a", 700L, 1.0), ("a", 900L, 4.0))
    val got = Downsample.m4(df(rows), "k", "ts", "v", W).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(2), r.getLong(3)) === ((100L, 5000000L))) // first
    assert((r.getLong(4), r.getLong(5)) === ((900L, 4000000L))) // last
    assert((r.getLong(6), r.getLong(7)) === ((500L, 1000000L))) // min, tie→min x
    assert((r.getLong(8), r.getLong(9)) === ((300L, 9000000L))) // max
    assert(r.getLong(10) === 5L)
  }

  test("m4 matches a driver-side reference across random buckets") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { i =>
      (if (i % 2 == 0) "a" else "b",
        rnd.nextInt(10000).toLong, rnd.nextInt(500) / 10.0)
    }
    def q(v: Double): Long = math.floor(v * 1000000.0).toLong
    val ref = rows.groupBy(r => (r._1, r._2 / W)).toSeq
      .map { case ((k, b), ps) =>
        val pts = ps.map(p => (p._2, q(p._3)))
        val first = pts.minBy(identity)
        val last = pts.maxBy(identity)
        val mn = pts.minBy { case (x, y) => (y, x) }
        val mx = pts.maxBy { case (x, y) => (y, x) }
        (k, b, first._1, first._2, last._1, last._2, mn._1, mn._2,
          mx._1, mx._2, ps.size.toLong)
      }.sortBy(t => (t._1, t._2))
    val got = Downsample.m4(df(rows), "k", "ts", "v", W)
      .orderBy($"k", $"bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10))).toSeq
    assert(got === ref)
  }

  test("rejects non-positive bucket width and colliding column names") {
    intercept[IllegalArgumentException] {
      Downsample.lttb(df(Seq(("a", 1L, 1.0))), "k", "ts", "v", 0L)
    }
    // keyCol reusing an OUTPUT name would duplicate a column in the result
    intercept[IllegalArgumentException] {
      Downsample.lttb(df(Seq(("a", 1L, 1.0))).withColumnRenamed("k", "bucket"),
        "bucket", "ts", "v", W)
    }
    // same guard on m4 (previously unguarded)
    intercept[IllegalArgumentException] {
      Downsample.m4(df(Seq(("a", 1L, 1.0))).withColumnRenamed("k", "x_min"),
        "x_min", "ts", "v", W)
    }
    // an input column reusing a reserved INTERNAL would silently shadow
    intercept[IllegalArgumentException] {
      Downsample.lttb(df(Seq(("a", 1L, 1.0))).withColumnRenamed("v", "__y"),
        "k", "ts", "__y", W)
    }
    // a merely-present unused column named like an output is fine — it is
    // projected away before any name is introduced
    val ok = Downsample.lttb(
      df(Seq(("a", 1L, 1.0))).withColumn("bucket", lit(1)),
      "k", "ts", "v", W)
    assert(ok.columns.toSeq === Seq("k", "bucket", "x_millis", "y_units",
      "n_points"))
    assert(ok.count() === 1L)
  }

  test("floor convention: negative epochs bucket identically to the " +
      "streaming floorDiv twin (no trunc-toward-zero divergence)") {
    import java.sql.Timestamp
    // -1 ms is inside bucket floor(-1/W) = -1, not trunc(-1/W) = 0
    val rows = Seq(("a", -1L, 1.0), ("a", -W - 1L, 2.0), ("a", 1L, 3.0))
    val got = Downsample.lttb(df(rows), "k", "ts", "v", W)
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    val expectBuckets = rows.map(r => Math.floorDiv(r._2, W)).distinct.sorted
    assert(got.map(_._1) === expectBuckets)
    assert(got.map(_._2) === rows.map(_._2).sorted) // one point per bucket
    val m4b = Downsample.m4(df(rows), "k", "ts", "v", W)
      .orderBy($"bucket").collect().map(_.getLong(1)).toSeq
    assert(m4b === expectBuckets)
  }
}
