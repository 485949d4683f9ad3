package graft

import java.nio.file.Files

import graft.streaming.StreamingJobs

/** Streaming quantile maintenance: continuous MRL folds, batch-id
  * fencing (MRL merges are not replay-free), exactness at capacity,
  * sparse-capacity bound, empty batches. */
class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("streamed folds at exact capacity reproduce the full-data order " +
      "statistics; empty batches are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sq_exact").toString
    val (st, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val q = StreamingJobs.quantilesOnArrival(
        source.toDF().toDF("v"), "v", capacity = 4096, st, ckpt)
      .start()
    try {
      source.addData(1L to 300L: _*)
      q.processAllAvailable()
      source.addData() // empty batch
      q.processAllAvailable()
      source.addData(301L to 1000L: _*)
      q.processAllAvailable()
      val got = StreamingJobs.quantileEstimates(spark, st,
          Seq(0.1, 0.5, 0.99))
        .as[(Double, Long, Long, Long)].collect().toSeq
      assert(got.map(_._2).distinct === Seq(1000L))
      assert(got.map(_._3).distinct === Seq(0L), "no collapses at capacity")
      // rank-ceil(p*n) over 1..1000 is just ceil(p*1000)
      assert(got.map(g => g._1 -> g._4).toMap ===
        Map(0.1 -> 100L, 0.5 -> 500L, 0.99 -> 990L))
    } finally q.stop()
  }

  test("redelivered batch is fenced out: same-id fold leaves state " +
      "bit-identical; sparse-capacity bound still certifies") {
    val dir = Files.createTempDirectory("sq_fence").toString
    val st = s"$dir/state"
    val vals = (0 until 2000).map(i => ((i * 48271L) % 10007))
    StreamingJobs.foldQuantiles(vals.toDF("v"), 0L, "v", 32, st)
    StreamingJobs.foldQuantiles(vals.take(500).toDF("v"), 1L, "v", 32, st)
    val before = StreamingJobs.quantileEstimates(spark, st, Seq(0.5, 0.9))
      .collect().toSeq
    // replays of BOTH already-folded batches must be no-ops
    StreamingJobs.foldQuantiles(vals.toDF("v"), 0L, "v", 32, st)
    StreamingJobs.foldQuantiles(vals.take(500).toDF("v"), 1L, "v", 32, st)
    val after = StreamingJobs.quantileEstimates(spark, st, Seq(0.5, 0.9))
      .collect().toSeq
    assert(after === before, "fenced replay must not change the state")
    val (n, err) = (after.head.getLong(1), after.head.getLong(2))
    assert(n === 2500L)
    assert(err > 0L && err < n)
    // the self-certified bound holds vs the true union
    val union = (vals ++ vals.take(500)).sorted
    for (row <- after) {
      val (p, est) = (row.getDouble(0), row.getLong(3))
      val r = math.max(1L, math.ceil(p * n).toLong)
      val lo = union.count(_ < est) + 1L
      val hi = union.count(_ <= est).toLong
      assert(lo <= r + err && hi >= r - err, s"p=$p est=$est")
    }
  }

  test("reader before any fold fails loudly") {
    val dir = Files.createTempDirectory("sq_empty").toString
    intercept[java.io.FileNotFoundException] {
      StreamingJobs.quantileEstimates(spark, s"$dir/state", Seq(0.5))
    }
  }
}
