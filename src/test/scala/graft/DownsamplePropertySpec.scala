package graft

import java.sql.Timestamp

import graft.operators.{Decayed, Downsample}

/** Randomized multi-seed contract checks for the two exact-arithmetic
  * selection operators: each seed replays the operator against an
  * independent driver-side implementation of the documented contract
  * (same discipline as the fixed-seed reference tests, widened across
  * seeds — one Spark job per seed keeps the suite cheap). */
class DownsamplePropertySpec extends SparkSpec {
  import spark.implicits._

  private val W = 1000L

  test("lttb == driver reference across seeds, key counts, and densities") {
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed * 101)
      val nKeys = 1 + rnd.nextInt(3)
      val span = 5000 + rnd.nextInt(15000)
      val rows = (1 to 200 + rnd.nextInt(300)).map { _ =>
        (s"k${rnd.nextInt(nKeys)}", (1 + rnd.nextInt(span)).toLong,
          rnd.nextInt(200000) / 100.0)
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
      val got = Downsample.lttb(
          rows.map { case (k, ms, v) => (k, new Timestamp(ms), v) }
            .toDF("k", "ts", "v"),
          "k", "ts", "v", W)
        .orderBy($"k", $"bucket").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got === ref, s"seed $seed")
    }
  }

  test("decayed leaderboard == driver reference across seeds and horizons") {
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed * 77)
      val maxBack = 2 + rnd.nextInt(6)
      val k = 1 + rnd.nextInt(6)
      val rows = (1 to 300 + rnd.nextInt(200)).map { _ =>
        (s"g${rnd.nextInt(2)}", rnd.nextInt(25).toLong,
          (1 + rnd.nextInt(30000)).toLong)
      }
      val byKW = rows.groupBy(r => (r._1, r._2, r._3 / W))
        .map { case ((g, i, w), ps) => (g, i, w, ps.size.toLong) }.toSeq
      val wmax = byKW.map(_._3).max
      val ref = byKW.filter(t => wmax - t._3 <= maxBack)
        .groupBy(t => (t._1, t._2))
        .map { case ((g, i), ps) =>
          (g, i, ps.map(t => t._4 * (1L << (maxBack - (wmax - t._3).toInt))).sum)
        }.toSeq
        .groupBy(_._1).flatMap { case (g, items) =>
          items.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
            .map { case ((_, i, s), idx) => (g, i, s, idx + 1) }
        }.toSeq.sortBy(t => (t._1, t._4))
      val got = Decayed.leaderboard(
          rows.map { case (g, i, ms) => (g, i, new Timestamp(ms)) }
            .toDF("g", "item", "ts"),
          "g", "item", "ts", W, maxBack, k)
        .orderBy($"g", $"rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSeq
      assert(got === ref, s"seed $seed")
    }
  }
}
