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

  test("a crash in the swap's rename window does not lose the distinct history") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sdist_crash").toString
    val source = MemoryStream[(String, Long)]
    val q = StreamingJobs.distinctOnArrival(
      source.toDF().toDF("k", "v"), Seq("k"), "v",
      s"$dir/state", s"$dir/ckpt").start()
    try {
      source.addData((1L to 300L).map(v => ("k0", v)): _*)
      q.processAllAvailable()
    } finally q.stop()
    // simulate the crash between swap's two renames: live is gone, the
    // complete new copy (with its _SUCCESS marker) sits in tmp
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/state", "state")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/state", ".state_tmp")
    assert(fs.rename(live, tmp), "fixture: stage live aside as tmp")
    // next batch (fresh query, same state path) must recover BEFORE
    // deciding merge-vs-fresh — otherwise the history restarts from this
    // batch alone
    val source2 = MemoryStream[(String, Long)]
    val q2 = StreamingJobs.distinctOnArrival(
      source2.toDF().toDF("k", "v"), Seq("k"), "v",
      s"$dir/state", s"$dir/ckpt2").start()
    try {
      source2.addData((301L to 320L).map(v => ("k0", v)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val est = StreamingJobs.distinctEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    assert(math.abs(est("k0") - 320L) <= 16L,
      s"history lost: est=${est("k0")}, expected ~320")
  }

  test("a read inside the rename window sees the state WITHOUT mutating it") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sdist_read").toString
    val source = MemoryStream[(String, Long)]
    val q = StreamingJobs.distinctOnArrival(
      source.toDF().toDF("k", "v"), Seq("k"), "v",
      s"$dir/state", s"$dir/ckpt").start()
    try {
      source.addData((1L to 250L).map(v => ("k0", v)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/state", "state")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/state", ".state_tmp")
    assert(fs.rename(live, tmp), "fixture: stage live aside as tmp")
    // a reader must not see ENOENT — the complete state sits in tmp —
    // but it must also NOT run recover()'s renames: a reader racing a
    // LIVE writer inside this exact window would steal the promote and
    // crash the stream. Repair belongs to the single writer's restart.
    val est = StreamingJobs.distinctEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    assert(math.abs(est("k0") - 250L) <= 13L,
      s"read-side tolerance failed: est=${est.get("k0")}, expected ~250")
    assert(!fs.exists(live) && fs.exists(tmp),
      "reader must leave the crashed directory untouched")
  }
}
