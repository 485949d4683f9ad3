package graft

import graft.operators.CountMin

/** Count-Min sketch: one-sided guarantee, deterministic merge, generous
  * width exactness, and the q123 error band on the fixture. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def itemsDf(xs: Seq[String]) = xs.toDF("item")

  test("estimates never undercount, and total n is tracked") {
    val xs = Seq.fill(40)("a") ++ Seq.fill(7)("b") ++ (1 to 50).map(i => s"x$i")
    val sk = CountMin.sketch(itemsDf(xs), "item", rows = 4, width = 32)
    assert(sk.n === xs.size)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, c) =>
      assert(sk.estimate(k) >= c, s"undercount for $k") }
  }

  test("generous width: estimates are exact at this seed/data") {
    val xs = (1 to 100).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i"))
    val sk = CountMin.sketch(itemsDf(xs), "item", rows = 4, width = 16384)
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, c) => assert(sk.estimate(k) === c, s"key $k") }
  }

  test("merge is elementwise: partitioning cannot change any estimate") {
    val xs = (0 until 2000).map(i => s"k${i % 97}")
    val a = CountMin.sketch(itemsDf(xs), "item", rows = 4, width = 64)
    val b = CountMin.sketch(itemsDf(xs).repartition(13), "item", rows = 4, width = 64)
    assert(a.counts.toSeq === b.counts.toSeq)
    assert(a.n === b.n)
  }

  test("q123 band holds on the fixture: est <= exact + 2n/width for top users") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val sk = CountMin.sketch(ev, "user_id", rows = 4, width = 1024)
    val top = ev.groupBy($"user_id").count()
      .orderBy($"count".desc, $"user_id").limit(20).collect()
    val band = 2L * sk.n / 1024
    top.foreach { r =>
      val (u, c) = (r.getLong(0).toString, r.getLong(1))
      val est = sk.estimate(u)
      assert(est >= c && est <= c + band, s"user $u est $est exact $c band $band")
    }
  }

  test("unseen keys estimate at most the collision mass") {
    val xs = Seq.fill(1000)("hot")
    val sk = CountMin.sketch(itemsDf(xs), "item", rows = 4, width = 256)
    // an unseen key collides with `hot` in all 4 rows with prob ~ (1/256)^4
    assert(sk.estimate("never-seen") <= 1000L)
    assert(sk.estimate("hot") === 1000L)
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] { new CountMin.CountMinAgg(0, 8) }
    intercept[IllegalArgumentException] { new CountMin.CountMinAgg(4, 0) }
  }
}
