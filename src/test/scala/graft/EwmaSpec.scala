package graft

import graft.operators.TimeSeriesOps

/** Fixed-point EWMA: hand recurrence, floor (not truncate) division on
  * negatives, input-order invariance, driver-side reference equality. */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def toTs(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("hand recurrence with alpha = 1/8") {
    val df = Seq(
      (1L, toTs(10), 100L, 8.0),
      (1L, toTs(20), 101L, 0.0),
      (1L, toTs(30), 102L, 16.0)).toDF("k", "ts", "id", "v")
    val got = TimeSeriesOps.ewma(df, "k", "ts", "id", "v")
      .orderBy("rn").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // s1 = 8000; s2 = (7*8000+0)//8 = 7000; s3 = (7*7000+16000)//8 = 8125
    assert(got.toSeq === Seq((1L, 8000L, 8000L), (2L, 0L, 7000L), (3L, 16000L, 8125L)))
  }

  test("floor division on negative state (not truncation toward zero)") {
    val df = Seq(
      (1L, toTs(10), 100L, -1.0),
      (1L, toTs(20), 101L, 0.001)).toDF("k", "ts", "id", "v")
    val got = TimeSeriesOps.ewma(df, "k", "ts", "id", "v")
      .orderBy("rn").collect().map(_.getLong(3))
    // s2 = (7*(-1000) + 1) // 8 = -6999 // 8 = floor(-874.875) = -875
    // (truncation toward zero would give -874)
    assert(got.toSeq === Seq(-1000L, -875L))
  }

  test("input order and partitioning do not change the series") {
    val rows = (0 until 60).map { i =>
      (i % 5L, toTs(1000 - i * 7L), i.toLong, (i * 37 % 100) / 3.0) }
    val a = TimeSeriesOps.ewma(rows.toDF("k", "ts", "id", "v"), "k", "ts", "id", "v")
      .orderBy("k", "rn").collect().toSeq
    val b = TimeSeriesOps.ewma(
        scala.util.Random.shuffle(rows).toDF("k", "ts", "id", "v").repartition(7),
        "k", "ts", "id", "v")
      .orderBy("k", "rn").collect().toSeq
    assert(a === b)
  }

  test("equals a driver-side reference on generated data") {
    val rows = (0 until 200).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ewma:$i".getBytes("UTF-8"))
      (h(0) & 0x03L, toTs(i * 11L), i.toLong, ((h(1) & 0xff) - 128) / 4.0) }
    val got = TimeSeriesOps.ewma(rows.toDF("k", "ts", "id", "v"), "k", "ts", "id", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val ref = rows.groupBy(_._1).flatMap { case (k, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._3))
      var s = 0L
      sorted.zipWithIndex.map { case ((_, _, _, v), i) =>
        val vu = math.floor(v * 1000 + 0.5).toLong
        s = if (i == 0) vu else Math.floorDiv(7 * s + vu, 8L)
        (k, i + 1L) -> ((vu, s))
      }
    }
    assert(got === ref)
  }

  test("parameter validation") {
    val df = Seq((1L, toTs(1), 1L, 1.0)).toDF("k", "ts", "id", "v")
    intercept[IllegalArgumentException] { TimeSeriesOps.ewma(df, "k", "ts", "id", "v", den = 1) }
    intercept[IllegalArgumentException] { TimeSeriesOps.ewma(df, "k", "ts", "id", "v", valueUnits = 0) }
  }
}
