package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.{IndexSnapshots, TextIndex}
import graft.streaming.StreamingJobs

/** In-stream maintenance orchestration: the every-N-batches
  * MaintenancePolicy knob on the ingest jobs runs the full
  * recover→compact→fsck→snapshot→prune cycle from inside foreachBatch,
  * so a continuously-ingesting index self-maintains — snapshots accrete
  * through the content-addressed object store, retention holds, answers
  * never change, and a failing fsck halts the stream BEFORE a corrupt
  * generation can be frozen. */
class StreamingMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def doc(day: Int, i: Int): (Long, String) =
    ((day * 1000 + i).toLong,
      (1 to 20).map(w => s"w${day}_${i}_$w").mkString(" ") +
        (if (i % 3 == 0) " spark join" else ""))

  private def hfs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tags(idx: String): Seq[String] =
    IndexSnapshots.list(spark, idx).select($"tag").as[String]
      .collect().toSeq.sorted

  private def objectCount(idx: String): Int = {
    val objRoot = new Path(s"$idx/_snapshots/_objects")
    val f = hfs(idx)
    if (!f.exists(objRoot)) 0
    else f.listStatus(objRoot).count(!_.getPath.getName.startsWith("."))
  }

  test("long ingest run with the maintenance knob on: snapshots accrete " +
      "incrementally on the every-N cadence, retention holds throughout, " +
      "answers equal a batch rebuild") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("smx_run").toString
    val idx = s"$dir/index"
    val policy = StreamingJobs.MaintenancePolicy(
      everyNBatches = 2, keepLast = 2, maxFilesPerDir = 3)
    val source = MemoryStream[(Long, String)]
    val q = StreamingJobs.indexOnArrival(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, s"$dir/ckpt", clearCachePerBatch = false,
        autoCompactFilesPerDir = Some(3), maintenance = Some(policy))
      .start()
    var corpus = Seq.empty[(Long, String)]
    try {
      (0 until 6).foreach { b =>
        val batch = (0 until 6).map(i => doc(b, i))
        source.addData(batch: _*)
        q.processAllAvailable()
        corpus = corpus ++ batch
        // retention must hold CONTINUOUSLY, not just at the end
        assert(tags(idx).size <= policy.keepLast,
          s"retention breached after batch $b: ${tags(idx)}")
      }
    } finally q.stop()
    val held = tags(idx)
    assert(held.size === 2 && held.forall(_.startsWith("auto_b")),
      s"expected two auto-tagged snapshots, got $held")
    assert(objectCount(idx) > 0,
      "cycles must accrete through the content-addressed object store")
    // the engine's serving answers equal a from-scratch batch rebuild
    val rebuilt = s"$dir/rebuild"
    TextIndex.save(corpus.toDF("doc_id", "text"), "doc_id", "text", rebuilt)
    val terms = Seq("spark", "join", "w2_3_7")
    assert(TextIndex.probe(spark, idx, terms, k = 20).collect().toSeq ===
      TextIndex.probe(spark, rebuilt, terms, k = 20).collect().toSeq,
      "in-stream maintenance must never change answers")
    // and the newest frozen generation serves the same ranking as live
    val newest = held.max
    assert(TextIndex.probe(spark,
        IndexSnapshots.at(spark, idx, newest), terms, k = 20)
      .collect().toSeq ===
      TextIndex.probe(spark, idx, terms, k = 20).collect().toSeq,
      "the last cycle's snapshot froze the final generation")
  }

  test("fsck abort: a corrupt generation halts the stream and is never " +
      "frozen; the standing snapshot remains the restore candidate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("smx_abort").toString
    val idx = s"$dir/index"
    val policy = StreamingJobs.MaintenancePolicy(
      everyNBatches = 1, keepLast = 3)
    // phase 1: one clean batch → one clean cycle, one snapshot
    val s1 = MemoryStream[(Long, String)]
    val q1 = StreamingJobs.indexOnArrival(
        s1.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, s"$dir/ckpt", clearCachePerBatch = false,
        maintenance = Some(policy))
      .start()
    try {
      s1.addData((0 until 8).map(i => doc(0, i)): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val good = tags(idx)
    assert(good.size === 1, s"one clean snapshot expected, got $good")
    // corrupt BETWEEN artifacts: drop a doc from the sidecar only (the
    // MaintenanceSpec corruption — fsck's dl-agreement check flips)
    val side = spark.read.parquet(s"$idx/docs").cache()
    side.count()
    side.filter($"doc_id" =!= 0L).write.mode("overwrite")
      .parquet(s"$idx/docs")
    side.unpersist()
    spark.catalog.refreshByPath(idx)
    // phase 2: the next due batch must FAIL the stream at the fsck gate
    val s2 = MemoryStream[(Long, String)]
    val q2 = StreamingJobs.indexOnArrival(
        s2.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, s"$dir/ckpt2", clearCachePerBatch = false,
        maintenance = Some(policy))
      .start()
    val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      s2.addData((0 until 4).map(i => doc(1, i)): _*)
      q2.processAllAvailable()
    }
    q2.stop()
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(failure).exists(_.contains("fsck failed")),
      s"the stream must die at the fsck gate, got: ${rootMessages(failure)}")
    assert(tags(idx) === good,
      "the corrupt generation must never be frozen; the good tag stands")
  }

  test("minhash family: the upsert stream's in-stream cycle snapshots and " +
      "prunes the dedup index; probe verdicts unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.MinHashIndex
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("smx_mh").toString
    val idx = s"$dir/index"
    val source = MemoryStream[(Long, String)]
    val q = StreamingJobs.upsertMinHashOnArrival(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, s"$dir/ckpt", clearCachePerBatch = false,
        maintenance = Some(StreamingJobs.MaintenancePolicy(
          everyNBatches = 2, keepLast = 1)))
      .start()
    var corpus = Seq.empty[(Long, String)]
    try {
      (0 until 4).foreach { b =>
        val batch = (0 until 10).map(i => doc(b, i))
        source.addData(batch: _*)
        q.processAllAvailable()
        corpus = corpus ++ batch
      }
    } finally q.stop()
    val held = tags(idx)
    assert(held.size === 1 && held.head.startsWith("auto_b"),
      s"keepLast=1 retention on the minhash family: $held")
    assert(objectCount(idx) > 0)
    // probe verdicts equal a batch rebuild's — maintenance never changed
    // the standing signatures
    val rebuilt = s"$dir/rebuild"
    MinHashIndex.save(corpus.toDF("doc_id", "text"), "doc_id", "text",
      rebuilt)
    val asks = Seq((9001L, corpus(3)._2), (9002L, "nothing like this zz"))
      .toDF("doc_id", "text")
    def verdicts(p: String) = MinHashIndex.probe(asks, "doc_id", "text",
        p, minEstJac = 0.5)
      .orderBy($"doc_id", $"corpus_id").collect().toSeq
    assert(verdicts(idx) === verdicts(rebuilt),
      "in-stream maintenance must not move any probe verdict")
  }

  test("policy validation and cold-start skip: a due batch before the " +
      "index exists is a no-op, not a stream failure") {
    intercept[IllegalArgumentException] {
      StreamingJobs.MaintenancePolicy(everyNBatches = 0, keepLast = 1)
    }
    intercept[IllegalArgumentException] {
      StreamingJobs.MaintenancePolicy(everyNBatches = 2, keepLast = 0)
    }
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("smx_cold").toString
    // vector job with NO pre-existing index and an empty first batch:
    // the mutation is skipped (empty batch) and the due cycle must skip
    // too (nothing to maintain), not fail the stream on recover-of-nothing
    val src = MemoryStream[(Long, Seq[Double])]
    val q = StreamingJobs.upsertIvfOnArrival(
        src.toDF().toDF("vec_id", "embedding")
          .filter($"vec_id" < 0L), // every batch drains empty
        "vec_id", "embedding", s"$dir/ivf", s"$dir/ckpt",
        clearCachePerBatch = false,
        maintenance = Some(StreamingJobs.MaintenancePolicy(1, 1)))
      .start()
    try {
      src.addData((1L, Seq(1.0, 2.0)))
      q.processAllAvailable() // must not throw
    } finally q.stop()
    assert(!hfs(dir).exists(new Path(s"$dir/ivf")),
      "no index may appear from an empty stream")
  }
}
