package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, concat, lit}

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

  test("upsertOnArrival: streamed edits replace, fresh ids insert, " +
      "redelivery converges, intra-batch conflict is deterministic") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ti_upstream").toString
    val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
    val source = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingJobs.upsertOnArrival(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, ckpt, clearCachePerBatch = false)
      .start()
    try {
      // batch 1 creates the index; doc 2 has an intra-batch conflict that
      // must resolve to the lexicographically greater text ("zz...")
      source.addData(
        (1L, "spark merge join scan"),
        (2L, "aa first version"),
        (2L, "zz spark window"))
      q.processAllAvailable()
      // batch 2: doc 1 EDITED (the indexOnArrival-refusing case) + new doc
      source.addData(
        (1L, "merge merge merge"),
        (3L, "spark scan scan"))
      q.processAllAvailable()
      // batch 3: pure redelivery of batch 2 — must converge, not double
      source.addData(
        (1L, "merge merge merge"),
        (3L, "spark scan scan"))
      q.processAllAvailable()
      val finalDocs = Seq(
        (1L, "merge merge merge"),
        (2L, "zz spark window"),
        (3L, "spark scan scan")).toDF("doc_id", "text")
      for (terms <- Seq(Seq("spark", "merge"), Seq("scan"))) {
        val viaIndex = TextIndex.probe(spark, idx, terms, k = 10)
          .collect().toSeq
        // scan-form emits zero-score docs the postings probe never sees
        val viaScan = Bm25.search(finalDocs, "doc_id", "text", terms, k = 10)
          .collect().toSeq.filter(_.getDouble(terms.length + 1) > 0.0)
        assert(viaIndex === viaScan,
          s"streamed upserts must equal a batch build of the edited corpus ($terms)")
      }
    } finally q.stop()
  }

  test("auto-compact inside the ingest stream: file growth bounded by the " +
      "policy, answers unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ti_autocompact").toString
    val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
    val source = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingJobs.indexOnArrival(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, ckpt, clearCachePerBatch = false,
        autoCompactFilesPerDir = Some(2))
      .start()
    try {
      for (b <- 0 until 6) {
        source.addData((1 to 5).map(i =>
          ((b * 10 + i).toLong, s"spark batch$b doc$i join merge")): _*)
        q.processAllAvailable()
      }
      assert(!graft.operators.IndexMaintenance.needsCompact(spark, idx, 2),
        "in-stream compaction must keep fragmentation under the policy")
      val allDocs = (0 until 6).flatMap(b => (1 to 5).map(i =>
        ((b * 10 + i).toLong, s"spark batch$b doc$i join merge")))
        .toDF("doc_id", "text")
      val viaIndex = TextIndex.probe(spark, idx, Seq("spark", "merge"), k = 40)
        .collect().toSeq
      val viaScan = Bm25.search(allDocs, "doc_id", "text",
        Seq("spark", "merge"), k = 40).collect().toSeq
      assert(viaIndex === viaScan)
    } finally q.stop()
  }

  test("stream restart inside compact's swap window: recovery runs before " +
      "the seen-set reads — the corpus is never overwritten by one batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ti_swapcrash").toString
    val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
    val corpus = (1L to 30L).map(i => (i, s"spark doc$i join merge"))
    TextIndex.save(corpus.toDF("doc_id", "text"), "doc_id", "text", idx)
    // simulate a compact that died between StagedSwap's two renames on
    // BOTH swapped artifacts: live staged aside, complete tmp present
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    for (sub <- Seq("postings", "docs")) {
      val live = new org.apache.hadoop.fs.Path(s"$idx/$sub")
      org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
        new org.apache.hadoop.fs.Path(s"$idx/${sub}_compact"),
        false, true, conf)
      assert(fs.rename(live, new org.apache.hadoop.fs.Path(s"$idx/${sub}_old")))
    }
    // a restarting ingest stream must repair, then APPEND — not save()
    val source = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingJobs.indexOnArrival(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, ckpt, clearCachePerBatch = false)
      .start()
    try {
      source.addData((100L, "spark fresh doc"))
      q.processAllAvailable()
    } finally q.stop()
    val all = (corpus :+ (100L, "spark fresh doc")).toDF("doc_id", "text")
    val viaIndex = TextIndex.probe(spark, idx, Seq("spark"), k = 40)
      .collect().toSeq
    val viaScan = Bm25.search(all, "doc_id", "text", Seq("spark"), k = 40)
      .collect().toSeq
    assert(viaIndex === viaScan,
      "the pre-crash corpus must survive the stream restart")
    // upsertOnArrival path too: crash window again, then an edit batch
    for (sub <- Seq("postings", "docs")) {
      val live = new org.apache.hadoop.fs.Path(s"$idx/$sub")
      org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
        new org.apache.hadoop.fs.Path(s"$idx/${sub}_compact"),
        false, true, conf)
      assert(fs.rename(live, new org.apache.hadoop.fs.Path(s"$idx/${sub}_old")))
    }
    val source2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingJobs.upsertOnArrival(
        source2.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, s"$dir/ckpt2", clearCachePerBatch = false)
      .start()
    try {
      source2.addData((1L, "merge edited doc"))
      q2.processAllAvailable()
    } finally q2.stop()
    val edited = ((2L to 30L).map(i => (i, s"spark doc$i join merge"))
      :+ (100L, "spark fresh doc") :+ (1L, "merge edited doc"))
      .toDF("doc_id", "text")
    assert(TextIndex.probe(spark, idx, Seq("spark"), k = 40).collect().toSeq
      === Bm25.search(edited, "doc_id", "text", Seq("spark"), k = 40)
        .collect().toSeq.filter(_.getDouble(2) > 0.0),
      "upsert restart must repair, replace the edit, and keep the corpus")
  }

  test("forgetOnArrival: streamed erasure fans to every serving index and " +
      "converges each to rebuilt-without; redelivered and absent ids are no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.MinHashIndex
    import graft.streaming.StreamingJobs.{MinHashIndexAt, TextIndexAt}
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ti_forget").toString
    val (tIdx, mIdx, ckpt) = (s"$dir/text", s"$dir/mh", s"$dir/ckpt")
    val all = fixtureDocs.cache()
    TextIndex.save(all, "doc_id", "text", tIdx)
    MinHashIndex.save(all, "doc_id", "text", mIdx)
    // PqIndexAt rides the same mechanism; ProductQuantizer.delete's own
    // contract (post-delete probe == rebuild-without) is pinned in PqSpec
    val source = MemoryStream[Long]
    val q = graft.streaming.StreamingJobs.forgetOnArrival(
        source.toDF().toDF("doc_id"), "doc_id",
        Seq(TextIndexAt(tIdx), MinHashIndexAt(mIdx)), ckpt,
        clearCachePerBatch = false)
      .start()
    try {
      val batch1 = all.filter($"doc_id" % 4 === 0)
        .select($"doc_id").as[Long].collect().toSeq
      source.addData(batch1: _*)
      q.processAllAvailable()
      // batch 2: redelivered ids from batch 1 + fresh ids + one absent id
      val batch2 = all.filter($"doc_id" % 4 === 1)
        .select($"doc_id").as[Long].collect().toSeq
      source.addData(batch1.take(3) ++ batch2 :+ -999L: _*)
      q.processAllAvailable()
      val metaBefore = spark.read.parquet(s"$tIdx/meta").collect().head
      // batch 3: ONLY absent ids — converged state must not move
      source.addData(-1L, -2L)
      q.processAllAvailable()
      val survivors = all.filter($"doc_id" % 4 >= 2)
      val (rebuiltT, rebuiltM) = (s"$dir/rebuiltT", s"$dir/rebuiltM")
      TextIndex.save(survivors, "doc_id", "text", rebuiltT)
      MinHashIndex.save(survivors, "doc_id", "text", rebuiltM)
      for (terms <- Seq(Seq("spark", "merge", "join"), Seq("window"))) {
        val a = TextIndex.probe(spark, tIdx, terms, k = 20).collect().toSeq
        val b = TextIndex.probe(spark, rebuiltT, terms, k = 20).collect().toSeq
        assert(a === b, s"query $terms diverged after streamed erasure")
      }
      // minhash leg: verbatim copies of a slice spanning erased + surviving
      // docs must hit exactly what a rebuilt-without index hits
      val probeDocs = all.filter($"doc_id" < 40)
        .select(($"doc_id" + 100000).as("doc_id"), $"text")
      def mhHits(p: String) =
        MinHashIndex.probe(probeDocs, "doc_id", "text", p, minEstJac = 0.5)
          .as[(Long, Long, Double)].collect().sortBy(h => (h._1, h._2)).toSeq
      val mhGot = mhHits(mIdx)
      assert(mhGot === mhHits(rebuiltM),
        "minhash streamed erasure diverged from rebuild")
      assert(!mhGot.exists(h => h._2 % 4 <= 1), "an erased doc id surfaced")
      assert(spark.read.parquet(s"$tIdx/meta").collect().head === metaBefore,
        "an absent-ids-only erasure batch must leave the corpus stats unmoved")
    } finally { q.stop(); all.unpersist() }
  }

  test("forgetOnArrival audit ledger: one row per (batch, family) with " +
      "exact before/after membership — the prove-you-forgot evidence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.MinHashIndex
    import graft.streaming.StreamingJobs.{MinHashIndexAt, TextIndexAt}
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ti_forgetaudit").toString
    val (tIdx, mIdx, ckpt, audit) =
      (s"$dir/text", s"$dir/mh", s"$dir/ckpt", s"$dir/audit")
    val all = fixtureDocs.cache()
    val n0 = all.count()
    TextIndex.save(all, "doc_id", "text", tIdx)
    MinHashIndex.save(all, "doc_id", "text", mIdx)
    val source = MemoryStream[Long]
    val q = graft.streaming.StreamingJobs.forgetOnArrival(
        source.toDF().toDF("doc_id"), "doc_id",
        Seq(TextIndexAt(tIdx), MinHashIndexAt(mIdx)), ckpt,
        clearCachePerBatch = false, auditPath = Some(audit))
      .start()
    try {
      val b1 = all.filter($"doc_id" % 4 === 0)
        .select($"doc_id").as[Long].collect().toSeq
      source.addData(b1: _*)
      q.processAllAvailable()
      // batch 2 mixes already-erased + absent ids: requested != removed,
      // and the audit shows exactly that
      source.addData(b1.take(2) :+ -999L: _*)
      q.processAllAvailable()
      val rows = spark.read.parquet(audit)
        .as[(Long, String, String, Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(rows.map(r => (r._1, r._2)) ===
        Seq((0L, "minhash"), (0L, "text_bm25"), (1L, "minhash"),
          (1L, "text_bm25")), s"one row per (batch, family): $rows")
      rows.filter(_._1 == 0L).foreach { r =>
        assert(r._4 === b1.size && r._5 === n0 && r._6 === n0 - b1.size,
          s"batch-0 evidence must show the exact removal: $r")
      }
      rows.filter(_._1 == 1L).foreach { r =>
        assert(r._4 === 3 && r._5 === n0 - b1.size && r._6 === r._5,
          s"already-erased + absent ids must show zero movement: $r")
      }
    } finally { q.stop(); all.unpersist() }
  }

  test("upsert == rebuild-with-replacements: edited docs serve only new " +
      "text, fresh docs insert, stats corrected; idempotent rerun") {
    val docs = fixtureDocs
    val path = s"$root/ixups"
    TextIndex.save(docs, "doc_id", "text", path)
    val ups = docs.filter($"doc_id" % 6 === 0)
      .select($"doc_id", concat($"text", lit(" upserted")).as("text"))
      .unionByName(docs.filter($"doc_id" === 1)
        .select(($"doc_id" + 7000).as("doc_id"),
          lit("upserted fresh row").as("text")))
    TextIndex.upsert(ups, "doc_id", "text", path)
    val rebuilt = s"$root/ixups_rebuilt"
    TextIndex.save(docs.filter($"doc_id" % 6 =!= 0)
      .select($"doc_id", $"text").unionByName(ups),
      "doc_id", "text", rebuilt)
    def probes(p: String) = Seq(Seq("upserted"), Seq("spark", "window"))
      .map(q => TextIndex.probe(spark, p, q, k = 15).collect().toSeq)
    assert(probes(path) === probes(rebuilt),
      "post-upsert probe diverged from rebuilt-with-replacements")
    assert(TextIndex.stats(spark, path).collect().toSeq ===
      TextIndex.stats(spark, rebuilt).collect().toSeq,
      "post-upsert stats diverged")
    TextIndex.upsert(ups, "doc_id", "text", path)
    assert(probes(path) === probes(rebuilt), "upsert rerun not idempotent")
  }

  test("stats: dashboard invariants hold; post-delete stats equal a " +
      "rebuilt index's") {
    val docs = fixtureDocs
    val path = s"$root/ixstats"
    TextIndex.save(docs, "doc_id", "text", path)
    val s0 = TextIndex.stats(spark, path)
      .as[(String, Long)].collect().toMap
    val nDocs = docs.count()
    assert(s0("n_docs") === nDocs)
    assert(s0("doc_rows") === nDocs, "meta/docs-sidecar staleness")
    assert(s0("nonempty_buckets") >= 1 &&
      s0("nonempty_buckets") <= s0("n_buckets"))
    assert(s0("distinct_terms") <= s0("posting_rows"))
    assert(s0("sum_dl") > 0)
    TextIndex.delete(spark, path,
      docs.filter($"doc_id" % 3 === 0).select($"doc_id"))
    val rebuilt = s"$root/ixstats_rebuilt"
    TextIndex.save(docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text", rebuilt)
    assert(TextIndex.stats(spark, path).collect().toSeq ===
      TextIndex.stats(spark, rebuilt).collect().toSeq,
      "post-delete stats diverge from a rebuilt-without index")
  }

  test("compact: fewer posting files, probe and stats bit-identical") {
    val docs = fixtureDocs
    val path = s"$root/ixcompact"
    // many small appends -> many files per bucket
    TextIndex.save(docs.filter($"doc_id" % 4 === 0), "doc_id", "text", path)
    for (r <- 1 to 3)
      TextIndex.append(docs.filter($"doc_id" % 4 === r), "doc_id", "text", path)
    def probes() = Seq(Seq("spark", "merge", "join"), Seq("window"))
      .map(q => TextIndex.probe(spark, path, q, k = 15).collect().toSeq)
    def stats() = TextIndex.stats(spark, path).collect().toSeq
    def nFiles() = {
      def count(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(count).sum).getOrElse(0)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      count(new java.io.File(s"$path/postings"))
    }
    val (p0, s0, f0) = (probes(), stats(), nFiles())
    TextIndex.compact(spark, path)
    assert(nFiles() < f0, s"compact must shrink file count (was $f0)")
    assert(probes() === p0, "compact changed probe answers")
    assert(stats() === s0, "compact changed the dashboard stats")
    // idempotent rerun
    TextIndex.compact(spark, path)
    assert(probes() === p0 && stats() === s0)
  }

  test("delete == rebuild: probe and meta match a fresh save without the ids") {
    val all = fixtureDocs.cache()
    val delIds = all.filter($"doc_id" % 3 === 0).select($"doc_id")
    val deleted = s"$root/ixd1"
    val rebuilt = s"$root/ixd2"
    TextIndex.save(all, "doc_id", "text", deleted)
    TextIndex.delete(spark, deleted, delIds)
    TextIndex.save(all.filter($"doc_id" % 3 =!= 0), "doc_id", "text", rebuilt)
    for (q <- Seq(Seq("spark", "merge", "join"), Seq("window"))) {
      val a = TextIndex.probe(spark, deleted, q, k = 20).collect().toSeq
      val b = TextIndex.probe(spark, rebuilt, q, k = 20).collect().toSeq
      assert(a === b, s"query $q diverged post-delete")
    }
    // the BM25 statistics themselves must be corrected, not just scores
    val ma = spark.read.parquet(s"$deleted/meta").collect().head
    val mb = spark.read.parquet(s"$rebuilt/meta").collect().head
    assert(ma.getLong(0) === mb.getLong(0), "n_docs stale after delete")
    assert(ma.getLong(1) === mb.getLong(1), "sum_dl stale after delete")
    all.unpersist()
  }

  test("delete is idempotent; deleting absent ids is a no-op") {
    val docs = fixtureDocs
    val path = s"$root/ixd3"
    TextIndex.save(docs, "doc_id", "text", path)
    val delIds = docs.filter($"doc_id" % 4 === 0).select($"doc_id")
    TextIndex.delete(spark, path, delIds)
    val once = TextIndex.probe(spark, path, Seq("spark"), k = 10).collect().toSeq
    TextIndex.delete(spark, path, delIds) // rerun: same ids, nothing left to remove
    assert(TextIndex.probe(spark, path, Seq("spark"), k = 10).collect().toSeq === once)
    TextIndex.delete(spark, path, // absent ids: no-op
      spark.range(900000, 900005).toDF("doc_id"))
    assert(TextIndex.probe(spark, path, Seq("spark"), k = 10).collect().toSeq === once)
  }

  test("delete recovers a crash left between the postings swap renames") {
    val docs = fixtureDocs
    val path = s"$root/ixd4"
    TextIndex.save(docs, "doc_id", "text", path)
    val delIds = docs.filter($"doc_id" % 4 === 0).select($"doc_id")
    // simulate the dangerous StagedSwap window for the postings subdir:
    // the filtered rewrite completed into postings_del (with _SUCCESS),
    // live was staged aside as postings_old, and the promote never ran
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    import org.apache.hadoop.fs.Path
    spark.read.parquet(s"$path/postings")
      .join(delIds.toDF("__del_id"), col("doc_id") === col("__del_id"), "left_anti")
      .write.partitionBy("bucket").parquet(s"$path/postings_del")
    assert(fs.rename(new Path(s"$path/postings"), new Path(s"$path/postings_old")))
    // rerunning the SAME delete must first recover, then complete
    TextIndex.delete(spark, path, delIds)
    val expectPath = s"$root/ixd4r"
    TextIndex.save(docs.filter($"doc_id" % 4 =!= 0), "doc_id", "text", expectPath)
    assert(TextIndex.probe(spark, path, Seq("spark", "join"), k = 15).collect().toSeq ===
      TextIndex.probe(spark, expectPath, Seq("spark", "join"), k = 15).collect().toSeq)
  }

  test("delete validation: emptying the index is rejected; multi-column ids rejected") {
    val docs = fixtureDocs
    val path = s"$root/ixd5"
    TextIndex.save(docs, "doc_id", "text", path)
    intercept[IllegalArgumentException] {
      TextIndex.delete(spark, path, docs.select($"doc_id")) }
    intercept[IllegalArgumentException] {
      TextIndex.delete(spark, path, docs.select($"doc_id", $"text")) }
    // the rejected delete must not have mutated anything
    assert(TextIndex.probe(spark, path, Seq("spark"), k = 5).count() === 5L)
  }

  test("delete rejects a rewrite whose survivors are all token-less " +
      "(zero postings rows would brick the index)") {
    val path = s"$root/ixd6"
    // null text is the token-less shape: explode(null) emits no postings
    // rows, while the doc still lands in the docs/ sidecar
    val docs = Seq(
      (1L, "spark join window"),
      (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    TextIndex.save(docs, "doc_id", "text", path)
    // survivors 2 and 3 pass the docs-count guard but carry no postings
    val e = intercept[IllegalArgumentException] {
      TextIndex.delete(spark, path, Seq(1L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("token-less"))
    // the rejected delete must not have swapped anything
    assert(TextIndex.probe(spark, path, Seq("spark"), k = 5).count() === 1L)
    assert(spark.read.parquet(s"$path/docs").count() === 3L)
  }

  test("upsertOnArrival refuses a postings-without-docs index instead of " +
      "silently overwriting the corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ti_presidecar").toString
    val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
    TextIndex.save(fixtureDocs, "doc_id", "text", idx)
    // simulate a pre-sidecar-format index: postings/meta live, docs/ gone
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$idx/docs"), true))
    val nPostings = spark.read.parquet(s"$idx/postings").count()
    val source = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingJobs.upsertOnArrival(
        source.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idx, ckpt, clearCachePerBatch = false)
      .start()
    try {
      source.addData((1L, "one tiny batch"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("refusing to overwrite"),
        s"expected the loud pre-sidecar refusal, got: ${e.getMessage.take(500)}")
    } finally q.stop()
    // the corpus postings survived untouched — no one-batch overwrite
    assert(spark.read.parquet(s"$idx/postings").count() === nPostings)
  }

  test("a cold-start save crash self-heals: unreadable meta (save's last, " +
      "atomic write) means no save ever completed, so the replay re-saves") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // both text streams must self-heal the same state
    for ((job, tag) <- Seq(
        ((df: org.apache.spark.sql.DataFrame, idx: String, ck: String) =>
          graft.streaming.StreamingJobs.indexOnArrival(
            df, "doc_id", "text", idx, ck, clearCachePerBatch = false),
          "ioa"),
        ((df: org.apache.spark.sql.DataFrame, idx: String, ck: String) =>
          graft.streaming.StreamingJobs.upsertOnArrival(
            df, "doc_id", "text", idx, ck, clearCachePerBatch = false),
          "uoa"))) {
      val dir = Files.createTempDirectory(s"ti_coldcrash_$tag").toString
      val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
      val batch = Seq((1L, "spark merge join"), (2L, "spark scan window"))
      // simulate save dying AFTER postings, BEFORE docs/meta (w1): the
      // state that previously wedged both streams forever — the partial
      // postings made the batch look "seen" (or look pre-sidecar), and
      // the follow-up read of the missing meta failed on every restart
      TextIndex.save(batch.toDF("doc_id", "text"), "doc_id", "text", idx)
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$idx/docs"), true))
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$idx/meta"), true))
      val source = MemoryStream[(Long, String)]
      val q = job(source.toDF().toDF("doc_id", "text"), idx, ckpt).start()
      try {
        source.addData(batch: _*)
        q.processAllAvailable()
      } finally q.stop()
      val viaIndex = TextIndex.probe(spark, idx, Seq("spark"), k = 10)
        .collect().toSeq
      val viaScan = Bm25.search(batch.toDF("doc_id", "text"),
        "doc_id", "text", Seq("spark"), k = 10).collect().toSeq
      assert(viaIndex === viaScan, s"stream $tag must re-save, not wedge")
    }
  }

  test("meta writes are atomic: a crash inside delete's meta swap leaves " +
      "a recoverable state, never a half-written meta") {
    val path = s"$root/ixmeta"
    TextIndex.save(fixtureDocs, "doc_id", "text", path)
    val s0 = TextIndex.stats(spark, path).collect().toSeq
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    // simulate the swap dying between its two renames: live meta staged
    // aside as meta_old, the complete new copy still at meta_del
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$path/meta"), fs,
      new org.apache.hadoop.fs.Path(s"$path/meta_del"), false, true, conf)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/meta"),
      new org.apache.hadoop.fs.Path(s"$path/meta_old")))
    // any mutation entry point recovers it (recover-first discipline)
    TextIndex.recover(spark, path)
    assert(TextIndex.stats(spark, path).collect().toSeq === s0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/meta_del")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$path/meta_old")))
  }

  test("probeAll rejects duplicate query_id rows (they would double-count " +
      "shared terms)") {
    val path = s"$root/ixdup"
    TextIndex.save(fixtureDocs, "doc_id", "text", path)
    val dup = Seq(0L -> Seq("spark"), 0L -> Seq("spark", "join"))
      .toDF("query_id", "terms")
    val e = intercept[IllegalArgumentException] {
      TextIndex.probeAll(dup, "query_id", "terms", path, k = 3)
    }
    assert(e.getMessage.contains("ONE row per query_id"), e.getMessage)
    // within-row duplicate terms are deduped, matching probe's contract
    val within = Seq(0L -> Seq("spark", "spark")).toDF("query_id", "terms")
    val viaBatch = TextIndex.probeAll(within, "query_id", "terms", path, k = 3)
      .select($"doc_id", $"score").collect().toSeq
    val viaSingle = TextIndex.probe(spark, path, Seq("spark"), k = 3)
      .select($"doc_id", $"score").collect().toSeq
    assert(viaBatch === viaSingle)
  }

  test("probeAll == N single probes, row for row") {
    val docs = fixtureDocs
    val path = s"$root/ixb1"
    TextIndex.save(docs, "doc_id", "text", path)
    val querySets = Seq(
      0L -> Seq("spark", "merge", "join"),
      1L -> Seq("window"),
      2L -> Seq("vector", "scan"),
      3L -> Seq("zzz_nosuchterm"), // all-miss query: no rows
      4L -> Seq("shuffle", "zzz_nosuchterm")) // partial miss: term drops out
    val queries = querySets.toDF("query_id", "terms")
    val batched = TextIndex.probeAll(queries, "query_id", "terms",
        path, k = 12)
      .orderBy($"query_id", $"rank")
      .select($"query_id", $"doc_id", $"score")
      .collect().toSeq
    val singly = querySets.flatMap { case (qid, terms) =>
      // single probe rejects unseen-only queries at the df-map level?
      // no — it scores them to zero matches; same surface
      TextIndex.probe(spark, path, terms, k = 12)
        .select(lit(qid).as("query_id"), $"doc_id", $"score")
        .collect().toSeq
    }
    assert(batched === singly)
  }

  test("probeAll plan shape is independent of the number of queries " +
      "(no per-query jobs) and prunes bucket partitions") {
    val path = s"$root/ixb2"
    TextIndex.save(fixtureDocs, "doc_id", "text", path, nBuckets = 32)
    def planOf(qs: Seq[(Long, Seq[String])]) =
      TextIndex.probeAll(qs.toDF("query_id", "terms"), "query_id", "terms",
          path, k = 5)
        .queryExecution.executedPlan.toString
    val small = planOf(Seq(0L -> Seq("spark")))
    val large = planOf(Seq(0L -> Seq("spark"), 1L -> Seq("merge"),
      2L -> Seq("join"), 3L -> Seq("window"), 4L -> Seq("scan")))
    def scans(p: String) = p.sliding("Scan parquet".length)
      .count(_ == "Scan parquet")
    assert(scans(small) === scans(large),
      "postings-scan count must not grow with the query batch")
    assert(large.contains("PartitionFilters: ["), large.take(2000))
    assert(large.contains("WindowGroupLimit"),
      "per-query top-k must run as WindowGroupLimit, not a full sort")
  }

  test("probeAll maxDfFrac rejects stopword-scale terms in the batch") {
    val path = s"$root/ixb3"
    val docs = Seq(
      (1L, "common rare alpha"), (2L, "common beta"), (3L, "common gamma"),
      (4L, "common delta")).toDF("doc_id", "text")
    TextIndex.save(docs, "doc_id", "text", path)
    val qs = Seq(0L -> Seq("rare"), 1L -> Seq("common"))
      .toDF("query_id", "terms")
    val e = intercept[IllegalArgumentException] {
      TextIndex.probeAll(qs, "query_id", "terms", path, k = 3,
        maxDfFrac = 0.5)
    }
    assert(e.getMessage.contains("common"))
    assert(TextIndex.probeAll(qs, "query_id", "terms", path, k = 3)
      .count() === 4L) // 1 rare match + 4 common matches capped at k = 3
  }

  test("probe pins no cache fragments: many distinct probes leave the " +
      "persistent-RDD registry flat") {
    val path = s"$root/ixh1"
    TextIndex.save(fixtureDocs, "doc_id", "text", path)
    TextIndex.probe(spark, path, Seq("spark"), k = 3).collect() // warm
    // diff, not absolute emptiness: suites share the session in parallel
    // (the SparkSpec rule), so only the DELTA across our probes is ours
    val before = spark.sparkContext.getPersistentRDDs.size
    val terms = Seq("merge", "join", "window", "scan", "vector", "shuffle",
      "filter", "broadcast", "partition", "codegen", "stream", "schema")
    terms.foreach { t =>
      TextIndex.probe(spark, path, Seq(t), k = 3).collect()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before < terms.size / 2,
      s"probe must not pin a cache fragment per call ($before -> $after " +
        s"across ${terms.size} probes)")
  }

  test("probe maxDfFrac flags stopword-scale terms, permissive by default") {
    val path = s"$root/ixh2"
    // "common" appears in EVERY doc; "rare" in one
    val docs = Seq(
      (1L, "common rare alpha"), (2L, "common beta"), (3L, "common gamma"),
      (4L, "common delta")).toDF("doc_id", "text")
    TextIndex.save(docs, "doc_id", "text", path)
    val e = intercept[IllegalArgumentException] {
      TextIndex.probe(spark, path, Seq("rare", "common"), k = 3,
        maxDfFrac = 0.5)
    }
    assert(e.getMessage.contains("common") && !e.getMessage.contains("List(rare"),
      s"only the degenerate term is named: ${e.getMessage}")
    // df = 1 of 4 docs passes a 0.5 cap; default 1.0 accepts everything
    assert(TextIndex.probe(spark, path, Seq("rare"), k = 3, maxDfFrac = 0.5)
      .count() === 1L)
    assert(TextIndex.probe(spark, path, Seq("common"), k = 3).count() === 3L)
    intercept[IllegalArgumentException] {
      TextIndex.probe(spark, path, Seq("rare"), k = 3, maxDfFrac = 0.0)
    }
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
