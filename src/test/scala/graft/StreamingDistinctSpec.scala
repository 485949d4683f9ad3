package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingJobs

/** Streaming incremental distinct maintenance
  * ([[graft.streaming.StreamingJobs.distinctOnArrival]]): per-batch HLL
  * state folds, the error-band contract against an exact recompute, and
  * the property that makes the sketch the right state shape for
  * at-least-once delivery — a replayed batch moves nothing. */
class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch sketch folds stay in band; a replayed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sdist").toString
    val source = MemoryStream[(String, Long)]
    val stream = source.toDF().toDF("k", "v")
    val q = StreamingJobs.distinctOnArrival(
      stream, Seq("k"), "v", s"$dir/state", s"$dir/ckpt").start()
    val rnd = new scala.util.Random(11)
    val batch1 = (1 to 800).map(_ => (s"k${rnd.nextInt(2)}", rnd.nextInt(300).toLong))
    val batch2 = (1 to 800).map(_ => (s"k${rnd.nextInt(2)}", rnd.nextInt(500).toLong))
    try {
      source.addData(batch1: _*)
      q.processAllAvailable()
      source.addData(batch2: _*)
      q.processAllAvailable()
      val est = StreamingJobs.distinctEstimates(spark, s"$dir/state")
        .as[(String, Long)].collect().toMap
      val exact = (batch1 ++ batch2).groupBy(_._1)
        .view.mapValues(_.map(_._2).distinct.size.toLong).toMap
      exact.foreach { case (k, nd) =>
        assert(math.abs(est(k) - nd) <= math.max(1L, (nd * 0.05).toLong),
          s"$k est=${est(k)} exact=$nd")
      }
      // at-least-once replay: the SAME rows again — register max absorbs
      // them; a count-based state would double-count every key here
      source.addData(batch2: _*)
      q.processAllAvailable()
      val replayed = StreamingJobs.distinctEstimates(spark, s"$dir/state")
        .as[(String, Long)].collect().toMap
      assert(replayed === est, "replayed batch must not move any estimate")
    } finally q.stop()
  }
}
