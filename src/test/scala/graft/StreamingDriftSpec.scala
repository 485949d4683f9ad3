package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingJobs

/** Streaming histogram maintenance + drift-vs-baseline read: streamed
  * cumulative counts ≡ a batch recount of the union, redelivery is
  * fenced (incl. the empty-batch sentinel corner), and the drift frame
  * off the state equals Drift.binnedDrift over the raw frames. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("streamed cumulative histogram == batch recount; drift frame matches the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sdrift").toString
    val source = MemoryStream[Double]
    val q = StreamingJobs.histogramOnArrival(
      source.toDF().toDF("v"), "v", nBins = 5, lo = 0.0, hi = 100.0,
      s"$dir/state", s"$dir/ckpt").start()
    val b1 = (0 until 60).map(i => (i % 100).toDouble)
    val b2 = (0 until 40).map(i => 120.0 - i) // incl. out-of-range > 100
    try {
      source.addData(b1: _*); q.processAllAvailable()
      source.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val baseline = (0 until 100).map(_.toDouble).toDF("v")
    val got = StreamingJobs.histogramDrift(spark, s"$dir/state",
        baseline, "v", nBins = 5, lo = 0.0, hi = 100.0)
      .orderBy($"bin")
      .select($"bin", $"n_base", $"n_cur", $"p_cur", $"contrib", $"drifted")
      .collect()
    val expected = graft.operators.Drift.binnedDrift(
        baseline, (b1 ++ b2).toDF("v"), "v", nBins = 5, lo = 0.0, hi = 100.0)
      .orderBy($"bin")
      .select($"bin", $"n_base", $"n_cur", $"p_cur", $"contrib", $"drifted")
      .collect()
    assert(got.toSeq === expected.toSeq,
      "state-backed drift must equal the batch gate on the same data")
    assert(got.map(_.getLong(2)).sum === 100L, "no mass lost across batches")
  }

  test("drift alerts fire once per bin on first crossing, through the hook seam") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sdrift_alert").toString
    val hook = new graft.sinks.Sinks.RecordingAlertHook
    // baseline: uniform over [0, 100); stream: all mass into [0, 20)
    val baseline = (0 until 100).map(_.toDouble).toDF("v")
    val source = MemoryStream[Double]
    val q = StreamingJobs.driftAlertsOnArrival(
      source.toDF().toDF("v"), "v", nBins = 5, lo = 0.0, hi = 100.0,
      baseline, s"$dir/state", s"$dir/ckpt", hook).start()
    try {
      source.addData((0 until 50).map(i => (i % 20).toDouble): _*)
      q.processAllAvailable()
      val afterFirst = hook.sent.size
      assert(afterFirst >= 1, "the hot bin must alert on first crossing")
      assert(hook.sent.forall(_._2 == "#drift"))
      // same-shaped second batch: the SAME bins stay drifted — no re-alert
      source.addData((0 until 50).map(i => (i % 20).toDouble): _*)
      q.processAllAvailable()
      assert(hook.sent.size === afterFirst,
        s"already-fired bins must not re-alert: ${hook.sent}")
    } finally q.stop()
  }

  test("state-backed quantiles: within one bin width of exact over the streamed union") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sdrift_q").toString
    val source = MemoryStream[Double]
    val q = StreamingJobs.histogramOnArrival(
      source.toDF().toDF("v"), "v", nBins = 20, lo = 0.0, hi = 100.0,
      s"$dir/state", s"$dir/ckpt").start()
    val all = (0 until 500).map(i => ((i * 7919) % 100).toDouble)
    try {
      all.grouped(180).foreach { chunk =>
        source.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val est = StreamingJobs.histogramQuantiles(spark, s"$dir/state",
        nBins = 20, lo = 0.0, hi = 100.0, ps = Seq(0.5, 0.9))
      .select($"p", $"est_quantile").as[(Double, Double)].collect().toMap
    val sorted = all.sorted
    for (p <- Seq(0.5, 0.9)) {
      val exact = sorted(math.max(0, math.ceil(p * sorted.size).toInt - 1))
      assert(est(p) > exact && est(p) - exact <= 5.0,
        s"p=$p est=${est(p)} exact=$exact must sit within one bin above")
    }
  }

  test("a redelivered batch is fenced; the fence survives an empty first batch") {
    val dir = Files.createTempDirectory("sdrift_fence").toString
    // batch 0 EMPTY: only the sentinel pins committed = 0
    StreamingJobs.foldHistogram(Seq.empty[Double].toDF("v"), 0L,
      "v", 4, 0.0, 40.0, s"$dir/state")
    // redelivered batch 0 with poisoned content must be dropped
    StreamingJobs.foldHistogram(Seq(5.0, 15.0, 25.0).toDF("v"), 0L,
      "v", 4, 0.0, 40.0, s"$dir/state")
    // a real batch folds; its redelivery is idempotent
    StreamingJobs.foldHistogram(Seq(5.0, 5.0, 35.0).toDF("v"), 1L,
      "v", 4, 0.0, 40.0, s"$dir/state")
    StreamingJobs.foldHistogram(Seq(5.0, 5.0, 35.0).toDF("v"), 1L,
      "v", 4, 0.0, 40.0, s"$dir/state")
    val counts = StreamingJobs.histogramDrift(spark, s"$dir/state",
        Seq(1.0).toDF("v"), "v", 4, 0.0, 40.0)
      .orderBy($"bin").select($"n_cur").as[Long].collect().toSeq
    assert(counts === Seq(2L, 0L, 0L, 1L),
      s"fence failed: $counts (poison re-merge or double fold)")
  }
}
