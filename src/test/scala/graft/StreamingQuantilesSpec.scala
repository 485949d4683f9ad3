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
    intercept[java.io.FileNotFoundException] {
      StreamingJobs.groupedQuantileEstimates(spark, s"$dir/gstate",
        "lang", Seq(0.5))
    }
  }

  test("grouped streamed folds equal the batch store over the union; " +
      "strata merge DISTRIBUTED, never on the driver") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("sq_grp").toString
    val (st, ckpt) = (s"$dir/state", s"$dir/ckpt")
    def rows(lo: Int, hi: Int): Seq[(String, Long)] =
      (lo until hi).map(i => (s"lang${i % 5}", ((i * 48271L) % 10007)))
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = StreamingJobs.groupedQuantilesOnArrival(
        source.toDF().toDF("lang", "v"), "v", "lang",
        capacity = 64, st, ckpt)
      .start()
    try {
      source.addData(rows(0, 700): _*)
      q.processAllAvailable()
      source.addData() // empty batch: fence must survive, state unchanged
      q.processAllAvailable()
      source.addData(rows(700, 2000): _*)
      q.processAllAvailable()
    } finally q.stop()
    val ps = Seq(0.5, 0.9)
    val streamed = StreamingJobs.groupedQuantileEstimates(spark, st,
        "lang", ps)
      .as[(String, Double, Long, Long)].collect().toSeq
    assert(streamed.map(_._1).distinct.sorted ===
      (0 until 5).map(i => s"lang$i"))
    // each stratum's n appears once per requested p (2 ps here), so the
    // sum over all rows is ps.size × the 2000-row union
    assert(streamed.map(_._3).sum === ps.size * 2000L,
      s"per-stratum n must partition the union: $streamed")
    // per-stratum self-certified bound vs the true union, q235's contract
    val byLang = rows(0, 2000).groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted }
    for ((g, p, n, est) <- streamed) {
      val union = byLang(g)
      assert(n === union.size.toLong)
      val r = math.max(1L, math.ceil(p * n).toLong)
      // bound check through the store row's self-certified err
      val err = spark.read.parquet(s"$st/state").filter($"g" === g)
        .select($"err").as[Long].head()
      val lo = union.count(_ < est) + 1L
      val hi = union.count(_ <= est).toLong
      assert(lo <= r + err && hi >= r - err, s"g=$g p=$p est=$est err=$err")
    }
  }

  test("grouped fence: replayed batch ids leave the store bit-identical, " +
      "including after an empty batch carried the fence") {
    val dir = Files.createTempDirectory("sq_gfence").toString
    val st = s"$dir/state"
    def df(lo: Int, hi: Int) =
      (lo until hi).map(i => (s"g${i % 3}", i.toLong)).toDF("k", "v")
    StreamingJobs.foldGroupedQuantiles(df(0, 500), 0L, "v", "k", 32, st)
    // empty batch still advances the fence (sentinel row)
    StreamingJobs.foldGroupedQuantiles(df(0, 0), 1L, "v", "k", 32, st)
    StreamingJobs.foldGroupedQuantiles(df(500, 900), 2L, "v", "k", 32, st)
    val before = StreamingJobs.groupedQuantileEstimates(spark, st,
      "k", Seq(0.5, 0.99)).collect().toSeq
    Seq(0L, 1L, 2L).foreach { bid =>
      StreamingJobs.foldGroupedQuantiles(df(0, 900), bid, "v", "k", 32, st)
    }
    val after = StreamingJobs.groupedQuantileEstimates(spark, st,
      "k", Seq(0.5, 0.99)).collect().toSeq
    assert(after === before, "fenced replays must not change the store")
    // streamed folds ≡ one batch store over the union (same capacity):
    // n per stratum must match exactly; estimates stay within the
    // union store's certified bounds (merge orders differ, so the
    // ESTIMATES may differ — the n and bound contract is the invariant)
    val batchStore = graft.operators.QuantileSketch.summarizeToStore(
      df(0, 900), "v", "k", 32)
    val nStream = after.map(r => r.getString(0) -> r.getLong(2)).toMap
    val nBatch = batchStore.select($"g", $"n").as[(String, Long)]
      .collect().toMap
    assert(nStream === nBatch, "per-stratum n must equal the batch store")
  }

  test("mismatched checkpoint signature (fresh batch 0 vs advanced state) " +
      "warns loudly; genuine replay stays silent") {
    val dir = Files.createTempDirectory("sq_warn").toString
    val st = s"$dir/state"
    def df(lo: Int, hi: Int) =
      (lo until hi).map(i => (s"g${i % 2}", i.toLong)).toDF("k", "v")
    StreamingJobs.foldGroupedQuantiles(df(0, 100), 5L, "v", "k", 32, st)
    def captureErr(body: => Unit): String = {
      val buf = new java.io.ByteArrayOutputStream()
      val orig = System.err
      // route this thread's warnings into the buffer; suites run in
      // parallel, so only ASSERT ON CONTENT we caused, never on absence
      // of unrelated output
      System.setErr(new java.io.PrintStream(buf, true))
      try body finally System.setErr(orig)
      buf.toString
    }
    // the misconfiguration signature: a FRESH checkpoint (batchIds
    // restart at 0) pointed at the advanced state — fenced AND warned
    val warned = captureErr {
      StreamingJobs.foldGroupedQuantiles(df(100, 200), 0L, "v", "k", 32, st)
    }
    assert(warned.contains("fenced out batch 0"), warned)
    assert(warned.contains(st), warned)
    // a genuine replay of the committed id is silent (normal redelivery).
    // System.setErr swaps the PROCESS-global stream, so a concurrent
    // suite legitimately warning during this window lands in our buffer
    // too — assert absence only for THIS test's own statePath
    val silent = captureErr {
      StreamingJobs.foldGroupedQuantiles(df(0, 100), 5L, "v", "k", 32, st)
    }
    assert(!silent.contains(st), silent)
    // and neither path changed the state
    val est = StreamingJobs.groupedQuantileEstimates(spark, st,
      "k", Seq(0.5)).collect().toSeq
    assert(est.map(_.getLong(2)).sum === 100L, "no new data folded")
  }

  test("long-run ledger stays bounded: 50 grouped folds leave one state " +
      "generation, no staging leftovers") {
    val dir = Files.createTempDirectory("sq_bound").toString
    val st = s"$dir/state"
    def df(lo: Int, hi: Int) =
      (lo until hi).map(i => (s"g${i % 2}", i.toLong)).toDF("k", "v")
    (0 until 50).foreach { b =>
      StreamingJobs.foldGroupedQuantiles(
        df(b * 10, b * 10 + 10), b.toLong, "v", "k", 8, st)
    }
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // exactly the live generation stands — StagedSwap's swap deletes
    // `.state_old` at promote time, so superseded generations never
    // accrete across folds (the index families' auto-compact analogy)
    val children = fs.listStatus(new org.apache.hadoop.fs.Path(st))
      .map(_.getPath.getName).toSet
    assert(children === Set("state"), children.toString)
    // and the live generation itself is a handful of part files (one
    // write), not one per fold
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$st/state"))
      .count(_.getPath.getName.startsWith("part-"))
    assert(parts <= spark.sparkContext.defaultParallelism * 2,
      s"state dir fragmenting: $parts part files after 50 folds")
    // the fold count actually landed (nothing silently fenced)
    val n = StreamingJobs.groupedQuantileEstimates(spark, st, "k", Seq(0.5))
      .collect().map(_.getLong(2)).sum
    assert(n === 500L)
  }
}
