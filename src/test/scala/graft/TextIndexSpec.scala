package graft

import java.nio.file.Files

import graft.operators.{Bm25, TextIndex}

/** TextIndex: persisted-probe ≡ scan-form BM25, bucket-file pruning,
  * append ≡ rebuild, and the meta contract. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val d = Files.createTempDirectory("graft-textindex").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  private def fixtureDocs = graft.core.Tables.documents(spark, sfDir)

  test("probe over the persisted index == Bm25.search scan, fixture corpus") {
    val docs = fixtureDocs
    val path = s"$root/ix1"
    TextIndex.save(docs, "doc_id", "text", path)
    for (q <- Seq(Seq("spark", "merge", "join"), Seq("window"), Seq("vector", "scan"))) {
      val viaIndex = TextIndex.probe(spark, path, q, k = 15)
        .collect().toSeq
      val viaScan = Bm25.search(docs, "doc_id", "text", q, k = 15)
        .collect().toSeq
      assert(viaIndex === viaScan, s"query $q diverged")
    }
  }

  test("probe prunes non-query bucket files at the partition level") {
    val path = s"$root/ix2"
    TextIndex.save(fixtureDocs, "doc_id", "text", path, nBuckets = 32)
    val probed = TextIndex.probe(spark, path, Seq("spark"), k = 5)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert(plan.contains("bucket"), "probe must prune bucket partitions")
  }

  test("append == rebuild: probing the appended index matches a fresh save of the union") {
    val all = fixtureDocs.cache()
    val first = all.filter($"doc_id" % 2 === 0)
    val rest = all.filter($"doc_id" % 2 === 1)
    val appended = s"$root/ix3a"
    val rebuilt = s"$root/ix3b"
    TextIndex.save(first, "doc_id", "text", appended)
    TextIndex.append(rest, "doc_id", "text", appended)
    TextIndex.save(all, "doc_id", "text", rebuilt)
    val q = Seq("spark", "join")
    val a = TextIndex.probe(spark, appended, q, k = 20).collect().toSeq
    val b = TextIndex.probe(spark, rebuilt, q, k = 20).collect().toSeq
    assert(a === b)
    all.unpersist()
  }

  test("indexOnArrival: continuous ingest builds the index batch-wise, " +
      "redelivered ids never double postings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ti_stream").toString
    val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
    val source = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingJobs.indexOnArrival(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, ckpt, clearCachePerBatch = false)
      .start()
    try {
      // batch 1 creates the index (cold start)
      source.addData(
        (1L, "spark merge join scan"),
        (2L, "spark spark window"),
        (2L, "spark spark window")) // intra-batch duplicate id
      q.processAllAvailable()
      // batch 2: one redelivered id (must be a no-op) + one new doc
      source.addData(
        (2L, "spark spark window"),
        (3L, "merge merge join"))
      q.processAllAvailable()
      val viaIndex = TextIndex.probe(spark, idx, Seq("spark", "merge"), k = 10)
        .collect().toSeq
      val allDocs = Seq(
        (1L, "spark merge join scan"),
        (2L, "spark spark window"),
        (3L, "merge merge join")).toDF("doc_id", "text")
      val viaScan = Bm25.search(allDocs, "doc_id", "text", Seq("spark", "merge"), k = 10)
        .collect().toSeq
      assert(viaIndex === viaScan,
        "streamed index must equal a batch build over the distinct documents")
    } finally q.stop()
  }

  test("zero-match query returns empty; validation errors") {
    val path = s"$root/ix4"
    TextIndex.save(fixtureDocs, "doc_id", "text", path)
    assert(TextIndex.probe(spark, path, Seq("zzz_nosuchterm"), k = 5).count() === 0L)
    intercept[IllegalArgumentException] {
      TextIndex.probe(spark, path, Seq.empty, k = 5) }
    intercept[IllegalArgumentException] {
      TextIndex.probe(spark, path, Seq("a", "a"), k = 5) }
    intercept[IllegalArgumentException] {
      TextIndex.save(fixtureDocs, "doc_id", "text", s"$root/ix5", nBuckets = 0) }
  }
}
