package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingJobs

/** Streaming frequent-items maintenance
  * ([[graft.streaming.StreamingJobs.heavyHittersOnArrival]]): continuous
  * Misra–Gries folds under StagedSwap, the mergeable-summaries error
  * contract, and the batchId fence that makes a NON-idempotent merge safe
  * under at-least-once delivery — the transactional counterpart to
  * distinctOnArrival's idempotent-by-algebra story. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact at saturating capacity across batches; estimates read heaviest-first") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("shh").toString
    val source = MemoryStream[String]
    val q = StreamingJobs.heavyHittersOnArrival(
      source.toDF().toDF("item"), "item", capacity = 64,
      s"$dir/state", s"$dir/ckpt").start()
    val batch1 = Seq.fill(30)("a") ++ Seq.fill(12)("b") ++ Seq.fill(3)("c")
    val batch2 = Seq.fill(20)("b") ++ Seq.fill(5)("d")
    try {
      source.addData(batch1: _*)
      q.processAllAvailable()
      source.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // capacity >= distinct count: the decrement path never fires, so the
    // streamed summary IS the exact count table (the q105 oracle trick)
    val est = StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toSeq
    assert(est === Seq(("b", 32L), ("a", 30L), ("d", 5L), ("c", 3L)))
  }

  test("a redelivered batch is fenced out: non-idempotent merge, idempotent cycle") {
    val dir = Files.createTempDirectory("shh_fence").toString
    val b1 = Seq.fill(10)("x").toDF("item")
    val b2 = (Seq.fill(7)("x") ++ Seq.fill(4)("y")).toDF("item")
    StreamingJobs.foldHeavyHitters(b1, 0L, "item", 16, s"$dir/state")
    StreamingJobs.foldHeavyHitters(b2, 1L, "item", 16, s"$dir/state")
    val once = StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toSeq
    assert(once === Seq(("x", 17L), ("y", 4L)))
    // the at-least-once window: a crash between the state swap and the
    // offset commit redelivers batch 1 — without the fence the MG merge
    // would double-count it to x=24/y=8
    StreamingJobs.foldHeavyHitters(b2, 1L, "item", 16, s"$dir/state")
    val twice = StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toSeq
    assert(twice === once, "redelivered batch must leave the state bit-identical")
    // an out-of-order stale batch (id below the committed horizon) is
    // equally fenced
    StreamingJobs.foldHeavyHitters(b1, 0L, "item", 16, s"$dir/state")
    assert(StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toSeq === once)
  }

  test("sparse capacity keeps the mergeable-summaries error band") {
    val dir = Files.createTempDirectory("shh_band").toString
    val rnd = new scala.util.Random(17)
    // zipf-ish: heavy head + long tail, folded in 3 batches
    val all = (1 to 3000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 40) s"h${rnd.nextInt(3)}" else s"t${rnd.nextInt(60)}"
    }
    val capacity = 16
    all.grouped(1000).zipWithIndex.foreach { case (chunk, i) =>
      StreamingJobs.foldHeavyHitters(chunk.toDF("item"), i.toLong,
        "item", capacity, s"$dir/state")
    }
    val est = StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.size.toLong
    val bound = n / (capacity + 1)
    exact.foreach { case (k, c) =>
      if (c > bound)
        assert(est.contains(k), s"guaranteed heavy $k (count $c > $bound) missing")
      est.get(k).foreach { e =>
        assert(e <= c && c - e <= bound,
          s"$k: est $e outside [true-$bound, true] for true $c")
      }
    }
  }

  test("a read inside the swap's rename window sees the state without mutating it") {
    val dir = Files.createTempDirectory("shh_crash").toString
    StreamingJobs.foldHeavyHitters(Seq.fill(9)("z").toDF("item"), 0L,
      "item", 8, s"$dir/state")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/state", "state")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/state", ".state_tmp")
    assert(fs.rename(live, tmp), "fixture: stage live aside as tmp")
    val est = StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toSeq
    assert(est === Seq(("z", 9L)))
    // the reader must NOT repair the directory — a reader racing a live
    // writer inside this window would otherwise steal the promote and
    // crash the stream; repair belongs to the writer's own restart
    assert(!fs.exists(live) && fs.exists(tmp),
      "reader must leave the crashed directory untouched")
    // the next FOLD (the writer) recovers, and resumes from the restored
    // fence, not from scratch
    StreamingJobs.foldHeavyHitters(Seq.fill(2)("z").toDF("item"), 1L,
      "item", 8, s"$dir/state")
    assert(fs.exists(live) && !fs.exists(tmp), "writer recover must repair")
    assert(StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toSeq === Seq(("z", 11L)))
  }

  test("the fence survives an empty merged summary via the sentinel row") {
    val dir = Files.createTempDirectory("shh_empty").toString
    // batch 0 is EMPTY: zero data rows, but the sentinel must still pin
    // committed = 0 so a redelivery of batch 0 stays fenced out
    StreamingJobs.foldHeavyHitters(
      Seq.empty[String].toDF("item"), 0L, "item", 8, s"$dir/state")
    assert(StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().isEmpty)
    // redeliver batch 0 with DIFFERENT (poisoned) content — at-least-once
    // redelivery replays the same batchId; the fence must drop it even
    // though the state holds no data rows
    StreamingJobs.foldHeavyHitters(
      Seq.fill(5)("poison").toDF("item"), 0L, "item", 8, s"$dir/state")
    assert(StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().isEmpty,
      "empty-state fence lost: redelivered batch was re-merged")
    // a genuinely new batch still folds in
    StreamingJobs.foldHeavyHitters(
      Seq.fill(3)("a").toDF("item"), 1L, "item", 8, s"$dir/state")
    assert(StreamingJobs.heavyHitterEstimates(spark, s"$dir/state")
      .as[(String, Long)].collect().toSeq === Seq(("a", 3L)))
  }
}
