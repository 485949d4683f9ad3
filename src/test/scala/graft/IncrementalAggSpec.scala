package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.core.Tables.events(spark, sfDir)
    .select($"event_type", $"user_id", $"value").cache()

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select($"event_type", $"n_rows", $"sum_v".cast("string"),
        $"min_v", $"max_v")
      .as[(String, Long, String, Double, Double)].collect().toSet

  test("merge of random splits == full recompute, bit for bit") {
    val full = canon(IncrementalAgg.state(ev, Seq("event_type"), "value"))
    // 3-way split by user hash — disjoint, covers everything
    val parts = (0 until 3).map(i =>
      IncrementalAgg.state(ev.filter(pmod($"user_id", lit(3)) === i),
        Seq("event_type"), "value"))
    assert(canon(IncrementalAgg.merge(parts)) === full)
    // merging in a different order/grouping changes nothing
    val nested = IncrementalAgg.merge(Seq(
      IncrementalAgg.merge(Seq(parts(2), parts(0))), parts(1)))
    assert(canon(nested) === full)
  }

  test("state is idempotent under re-merge with an empty delta") {
    val s = IncrementalAgg.state(ev, Seq("event_type"), "value")
    val empty = IncrementalAgg.state(ev.filter(lit(false)),
      Seq("event_type"), "value")
    assert(canon(IncrementalAgg.merge(Seq(s, empty))) === canon(s))
  }

  test("a delta-only key appears; counts add across batches") {
    val a = IncrementalAgg.state(
      Seq(("x", 1.0), ("x", 2.0)).toDF("k", "v"), Seq("k"), "v")
    val b = IncrementalAgg.state(
      Seq(("x", 4.0), ("y", 7.5)).toDF("k", "v"), Seq("k"), "v")
    val m = IncrementalAgg.merge(Seq(a, b))
      .select($"k", $"n_rows", $"sum_v".cast("double"), $"min_v", $"max_v")
      .as[(String, Long, Double, Double, Double)].collect()
      .map { case (k, n, s, mn, mx) => k -> ((n, s, mn, mx)) }.toMap
    assert(m("x") === ((3L, 7.0, 1.0, 4.0)))
    assert(m("y") === ((1L, 7.5, 7.5, 7.5)))
  }

  test("streaming maintenance: foreachBatch-merged state == batch recompute") {
    // the streaming materialized view: each micro-batch folds into the
    // state via merge(state, partial(batch)); after the stream drains,
    // the maintained state must equal a full batch recompute bit-for-bit
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val source = MemoryStream[(String, Double)]
    var stateDf = IncrementalAgg.state(
      Seq.empty[(String, Double)].toDF("k", "v"), Seq("k"), "v")
    val all = Seq(
      Seq(("a", 1.5), ("b", 2.0)),
      Seq(("a", -0.5), ("c", 10.0)),
      Seq(("b", 4.25), ("a", 3.0)))
    val q = source.toDS().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        stateDf = IncrementalAgg.merge(Seq(
          stateDf, IncrementalAgg.state(batch, Seq("k"), "v")))
          .localCheckpoint()
        ()
      }
      .start()
    all.foreach { rows => source.addData(rows: _*); q.processAllAvailable() }
    q.stop()

    val full = canon2(IncrementalAgg.state(
      all.flatten.toDF("k", "v"), Seq("k"), "v"))
    assert(canon2(stateDf) === full)
  }

  private def canon2(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"n_rows", $"sum_v".cast("string"), $"min_v", $"max_v")
      .as[(String, Long, String, Double, Double)].collect().toSet

  test("mismatched state schemas and reserved key names are rejected") {
    val good = IncrementalAgg.state(
      Seq(("x", 1.0)).toDF("k", "v"), Seq("k"), "v")
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(Seq(good, good.drop("max_v")))
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.state(Seq((1.0, 2.0)).toDF("sum_v", "v"),
        Seq("sum_v"), "v")
    }
  }

  // ---- IncrementalDistinct (HLL sketch states) ---------------------------

  private lazy val distinctRows = {
    val rnd = new scala.util.Random(7)
    (1 to 3000).map(_ => (s"k${rnd.nextInt(3)}", rnd.nextInt(400).toLong))
  }

  test("distinct sketch: merged deltas stay in band under any batching") {
    val df = distinctRows.toDF("k", "v")
    val exact = df.groupBy($"k").agg(countDistinct($"v").as("nd"))
      .as[(String, Long)].collect().toMap
    for (nSplits <- Seq(2, 5)) {
      // overlapping-key deltas: the same k (and often the same v) lands in
      // several splits — exactly the case naive count merging double-counts
      val states = (0 until nSplits).map(i =>
        graft.operators.IncrementalDistinct.state(
          df.filter(pmod(hash($"v"), lit(nSplits)) === i), Seq("k"), "v"))
      val merged = graft.operators.IncrementalDistinct
        .estimate(graft.operators.IncrementalDistinct.merge(states))
        .as[(String, Long)].collect().toMap
      exact.foreach { case (k, nd) =>
        assert(math.abs(merged(k) - nd) <= math.max(1L, (nd * 0.05).toLong),
          s"splits=$nSplits $k merged=${merged(k)} exact=$nd")
      }
    }
  }

  test("distinct sketch: estimate within the lgK=12 band of exact; state bounded") {
    val df = distinctRows.toDF("k", "v")
    val exact = df.groupBy($"k").agg(countDistinct($"v").as("nd"))
      .as[(String, Long)].collect().toMap
    val est = graft.operators.IncrementalDistinct
      .estimate(graft.operators.IncrementalDistinct.state(df, Seq("k"), "v"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, nd) =>
      assert(math.abs(est(k) - nd) <= math.max(1L, (nd * 0.05).toLong),
        s"$k est=${est(k)} exact=$nd")
    }
    val sizes = graft.operators.IncrementalDistinct.state(df, Seq("k"), "v")
      .select(length($"nd_sketch")).as[Int].collect()
    assert(sizes.forall(_ <= 64 * 1024), "sketch state must stay KB-sized")
  }
}
