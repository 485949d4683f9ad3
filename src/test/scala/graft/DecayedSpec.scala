package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.Decayed

/** Decayed trending leaderboard: exact half-life weights, cutoff, ties,
  * top-k, invariance. */
class DecayedSpec extends SparkSpec {
  import spark.implicits._

  private val W = 1000L // 1 s windows

  private def df(rows: Seq[(String, Long, Long)]): DataFrame =
    rows.map { case (k, item, ms) => (k, item, new Timestamp(ms)) }
      .toDF("k", "item", "ts")

  private def run(rows: Seq[(String, Long, Long)], maxBack: Int = 3,
      k: Int = 10): Seq[(String, Long, Long, Int)] =
    Decayed.leaderboard(df(rows), "k", "item", "ts", W, maxBack, k)
      .orderBy($"k", $"rank")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq

  test("scores are per-window counts times exact power-of-two weights") {
    // newest window = 3; weights (in units of 2^-3): w3→8, w2→4, w1→2, w0→1
    val rows = Seq(
      ("a", 1L, 3100L), ("a", 1L, 3200L),            // 2·8 = 16
      ("a", 2L, 3100L), ("a", 2L, 2100L), ("a", 2L, 2200L), // 8 + 2·4 = 16
      ("a", 3L, 100L), ("a", 3L, 150L), ("a", 3L, 180L))    // 3·1 = 3
    val got = run(rows)
    // tie at 16 breaks on item ascending
    assert(got === Seq(("a", 1L, 16L, 1), ("a", 2L, 16L, 2), ("a", 3L, 3L, 3)))
  }

  test("windows older than maxBack contribute zero and drop out entirely") {
    val rows = Seq(
      ("a", 1L, 9100L),              // window 9 (newest)
      ("a", 2L, 100L), ("a", 2L, 200L)) // window 0, delta 9 > maxBack=3
    val got = run(rows)
    assert(got === Seq(("a", 1L, 8L, 1)))
  }

  test("leaderboard truncates at k per key, independently across keys") {
    val rows = (1L to 6L).map(i => ("a", i, 1000L + i)) ++
      (1L to 2L).map(i => ("b", i, 1000L + i))
    val got = run(rows, k = 3)
    assert(got.count(_._1 == "a") === 3 && got.count(_._1 == "b") === 2)
    assert(got.filter(_._1 == "a").map(_._2) === Seq(1L, 2L, 3L))
  }

  test("matches a driver-side reference on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 600).map { _ =>
      (if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(20).toLong, rnd.nextInt(30000).toLong)
    }
    val maxBack = 5
    val byKW = rows.groupBy(r => (r._1, r._2, r._3 / W))
      .map { case ((k, i, w), ps) => (k, i, w, ps.size.toLong) }.toSeq
    val wmax = byKW.map(_._3).max
    val ref = byKW.filter(t => wmax - t._3 <= maxBack)
      .groupBy(t => (t._1, t._2))
      .map { case ((k, i), ps) =>
        (k, i, ps.map(t => t._4 * (1L << (maxBack - (wmax - t._3).toInt))).sum)
      }.toSeq
      .groupBy(_._1).flatMap { case (k, items) =>
        items.sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
          .map { case ((_, i, s), idx) => (k, i, s, idx + 1) }
      }.toSeq.sortBy(t => (t._1, t._4))
    assert(run(rows, maxBack = maxBack) === ref)
  }

  test("ranking is invariant to input partitioning") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 400).map { _ =>
      ("a", rnd.nextInt(15).toLong, rnd.nextInt(20000).toLong)
    }
    val a = Decayed.leaderboard(df(rows), "k", "item", "ts", W, 4, 10)
    val b = Decayed.leaderboard(df(rows).repartition(9), "k", "item", "ts", W, 4, 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("rejects bad parameters") {
    val d = df(Seq(("a", 1L, 1L)))
    intercept[IllegalArgumentException] {
      Decayed.leaderboard(d, "k", "item", "ts", 0L)
    }
    intercept[IllegalArgumentException] {
      Decayed.leaderboard(d, "k", "item", "ts", W, maxBack = 41)
    }
    intercept[IllegalArgumentException] {
      Decayed.leaderboard(d, "k", "item", "ts", W, k = 0)
    }
  }
}
