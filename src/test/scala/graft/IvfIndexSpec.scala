package graft

import graft.core.Tables
import graft.operators.{IvfIndex, Similarity}

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("training yields nLists unit-norm centroids, deterministically") {
    val c1 = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8)
    val rows = c1.collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"centroid norm $norm")
    }
    val c2 = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8)
    assert(c1.collect().map(_.toString).sorted.toSeq ===
      c2.collect().map(_.toString).sorted.toSeq)
  }

  test("every vector lands in exactly one list") {
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8)
    val assigned = IvfIndex.assign(emb, "vec_id", "embedding", centroids)
    assert(assigned.count() === emb.count())
    assert(assigned.select("vec_id").distinct().count() === emb.count())
    assert(assigned.select("list_id").distinct().count() <= 8)
  }

  test("lists written partitionBy(list_id) prune at the file level on probe") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_lists").toString + "/lists"
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8)
    IvfIndex.assign(emb, "vec_id", "embedding", centroids)
      .write.partitionBy("list_id").parquet(dir)
    val probe = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("list_id").isin(0, 3))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert(plan.contains("list_id"), "probe filter must prune list partitions")
    // only the probed lists' files are scanned
    assert(probe.select("list_id").distinct().count() <= 2)
  }

  test("fit once, probe many: a prebuilt model reproduces topK exactly") {
    val queries = emb.filter($"vec_id" < 10)
    val model = IvfIndex.fit(emb, "vec_id", "embedding", nLists = 8, iters = 3)
    assert(model.nLists === 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank").collect().map(_.toString).toSeq
    val viaModel = rows(IvfIndex.probe(queries, emb, "vec_id", "embedding",
      k = 5, model, nProbe = 4))
    val oneShot = rows(IvfIndex.topK(queries, emb, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 4))
    assert(viaModel === oneShot)
    // the model is plain data: probing twice is bit-identical, no retrain
    val again = rows(IvfIndex.probe(queries, emb, "vec_id", "embedding",
      k = 5, model, nProbe = 4))
    assert(again === viaModel)
  }

  test("fit is independent of input partitioning (hash-ordered sample)") {
    val m1 = IvfIndex.fit(emb.repartition(1), "vec_id", "embedding",
      nLists = 8, iters = 2)
    val m2 = IvfIndex.fit(emb.repartition(13, $"label"), "vec_id", "embedding",
      nLists = 8, iters = 2)
    assert(m1 === m2)
  }

  test("persisted index: save/load round trip, file-pruned probe matches live probe") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_saved").toString + "/index"
    val model = IvfIndex.fit(emb, "vec_id", "embedding", nLists = 8, iters = 2)
    IvfIndex.save(emb, "vec_id", "embedding", model, dir)
    val (loaded, lists) = IvfIndex.load(spark, dir)
    assert(loaded === model, "centroids survive the round trip exactly")
    val queries = emb.filter($"vec_id" < 10)
    val viaIndex = IvfIndex.probeIndexed(queries, lists, "vec_id", "embedding",
      k = 5, loaded, nProbe = 3)
    val live = IvfIndex.probe(queries, emb, "vec_id", "embedding",
      k = 5, model, nProbe = 3)
    assert(viaIndex.orderBy($"query_id", $"rank").collect().map(_.toString).toSeq ===
      live.orderBy($"query_id", $"rank").collect().map(_.toString).toSeq)
    // the probed-list isin filter must prune at the file level
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert(plan.contains("list_id"), "probe must prune list partitions")
  }

  test("probeIndexed with the FULL corpus as query batch matches live probe " +
      "(driver sees only distinct list ids, never the batch)") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_batch").toString + "/index"
    val model = IvfIndex.fit(emb, "vec_id", "embedding", nLists = 8, iters = 2)
    IvfIndex.save(emb, "vec_id", "embedding", model, dir)
    val (loaded, lists) = IvfIndex.load(spark, dir)
    // every corpus vector as a query: the pruning collect stays <= nLists
    // integers no matter the batch size; only this result hits the driver
    val viaIndex = IvfIndex.probeIndexed(emb, lists, "vec_id", "embedding",
      k = 3, loaded, nProbe = 2)
    val live = IvfIndex.probe(emb, emb, "vec_id", "embedding",
      k = 3, model, nProbe = 2)
    assert(viaIndex.orderBy($"query_id", $"rank").collect().map(_.toString).toSeq ===
      live.orderBy($"query_id", $"rank").collect().map(_.toString).toSeq)
    // the probe side reaches scoreProbes as a PLAN (broadcast exchange),
    // not as a driver-materialized local relation of collected rows
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    assert(!plan.contains("LocalTableScan"),
      "probe frame must stay distributed, not be collected and re-created")
  }

  test("IVF top-k achieves >= 50% recall@5 vs brute force at 1/2 probe ratio") {
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.cosineTopK(queries, emb, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = IvfIndex.topK(queries, emb, "vec_id", "embedding", k = 5,
        nLists = 8, nProbe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }

  test("append ingests batches against the saved centroids; compact preserves " +
      "probes and bounds files") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString
    val part1 = emb.filter($"vec_id" % 3 === 0)
    val part2 = emb.filter($"vec_id" % 3 === 1)
    val part3 = emb.filter($"vec_id" % 3 === 2)
    val queries = emb.filter($"vec_id" < 10)
    // fit on the first batch only (the "standing corpus"), then ingest
    val model = IvfIndex.fit(part1, "vec_id", "embedding", nLists = 8, iters = 3)
    IvfIndex.save(part1, "vec_id", "embedding", model, dir)
    IvfIndex.append(part2, "vec_id", "embedding", dir)
    IvfIndex.append(part3, "vec_id", "embedding", dir)
    def probeRows() = {
      val (m, lists) = IvfIndex.load(spark, dir)
      IvfIndex.probeIndexed(queries, lists, "vec_id", "embedding",
          k = 5, m, nProbe = 8)
        .orderBy($"query_id", $"rank").collect().map(_.toString).toSeq
    }
    val appended = probeRows()
    // appended index == one-shot save of the union under the SAME model
    // (assignment only depends on the immutable centroids)
    val refDir = java.nio.file.Files.createTempDirectory("ivf_ref").toString
    IvfIndex.save(part1.unionByName(part2).unionByName(part3),
      "vec_id", "embedding", model, refDir)
    val (mRef, listsRef) = IvfIndex.load(spark, refDir)
    val oneShot = IvfIndex.probeIndexed(queries, listsRef, "vec_id",
        "embedding", k = 5, mRef, nProbe = 8)
      .orderBy($"query_id", $"rank").collect().map(_.toString).toSeq
    assert(appended === oneShot)
    // compact: identical probe results, strictly fewer files
    def countFiles(): Int =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "lists"))
        .filter(p => p.toString.endsWith(".parquet")).count().toInt
    val before = countFiles()
    IvfIndex.compact(spark, dir)
    assert(probeRows() === appended, "compact must not change probe results")
    val after = countFiles()
    assert(after < before, s"compact must shrink file count ($before -> $after)")
    assert(after <= 8, s"~one file per list after compact, got $after")
  }

  test("staleness flags a drifted ingest batch; refit re-spreads lists, " +
      "clears the flag, and restores recall") {
    // synthetic clustered fixture (the real embeddings are quasi-random —
    // every direction is equally "far", so no batch can drift): corpus =
    // two tight axis-aligned clusters; the drifted batch is a third
    // cluster on an axis orthogonal to both, hence cos ≈ 0 to every
    // fitted centroid and assigned distance ≈ 1 >> the fit profile.
    val dim = 8
    def vec(axis: Int, i: Int): Seq[Double] = {
      val noise = Seq.tabulate(dim)(d => ((i * 37 + d * 11) % 13 - 6) / 100.0)
      val raw = Seq.tabulate(dim)(d => (if (d == axis) 1.0 else 0.0) + noise(d))
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nrm)
    }
    val corpus = ((0 until 120).map(i => (i.toLong, vec(0, i))) ++
      (120 until 240).map(i => (i.toLong, vec(1, i)))).toDF("vec_id", "embedding")
    val drifted = (1000 until 1120).map(i => (i.toLong, vec(2, i)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift").toString + "/index"
    val model = IvfIndex.fit(corpus, "vec_id", "embedding", nLists = 4, iters = 3)
    IvfIndex.save(corpus, "vec_id", "embedding", model, dir)
    // a batch drawn from the indexed distribution: NOT drifted
    val same = ((240 until 270).map(i => (i.toLong, vec(0, i))) ++
      (270 until 300).map(i => (i.toLong, vec(1, i)))).toDF("vec_id", "embedding")
    val s1 = IvfIndex.staleness(same, "vec_id", "embedding", dir).head()
    assert(!s1.getAs[Boolean]("drifted"), s"in-distribution batch flagged: $s1")
    val s2 = IvfIndex.staleness(drifted, "vec_id", "embedding", dir).head()
    assert(s2.getAs[Boolean]("drifted"), s"drifted batch not flagged: $s2")
    assert(s2.getAs[Double]("frac_beyond_fit_p90") > 0.9,
      s"a whole new region should sit almost entirely beyond fit p90: $s2")
    // ingest the drifted region against the (now stale) centroids
    IvfIndex.append(drifted, "vec_id", "embedding", dir)
    def maxListShare(): Double = {
      val counts = spark.read.parquet(s"$dir/lists").groupBy("list_id")
        .count().select("count").as[Long].collect()
      counts.max.toDouble / counts.sum
    }
    val before = maxListShare()
    // refit from current contents: swaps centroids + reassigned lists + stats
    val m2 = IvfIndex.refit(spark, dir, "vec_id", "embedding", iters = 3)
    assert(m2.nLists === 4)
    val (loaded, lists) = IvfIndex.load(spark, dir)
    assert(loaded === m2, "refit swaps the centroids it returns")
    // the same batch measured against the refit index is no longer drifted
    val s3 = IvfIndex.staleness(drifted, "vec_id", "embedding", dir).head()
    assert(!s3.getAs[Boolean]("drifted"), s"refit did not absorb the region: $s3")
    // the stale index crammed the whole drifted cluster into one list; the
    // refit centroids cover all three clusters, so the worst share drops
    val after = maxListShare()
    assert(after < before,
      s"refit must re-spread list occupancy ($before -> $after)")
    // and probing the refit index finds the drifted vectors' true neighbors
    val queries = drifted.filter($"vec_id" % 10 === 0)
    val union = corpus.unionByName(drifted)
    val exact = Similarity.cosineTopK(queries, union, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = IvfIndex.probeIndexed(queries, lists, "vec_id", "embedding",
        k = 5, loaded, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"post-refit recall@5 = $recall")
  }

  test("streaming vector ingest: staleness-gated append/refit cycle via foreachBatch") {
    // the maintenance loop a continuous embedding-ingest job runs: per
    // micro-batch, audit staleness -> append -> refit when the batch
    // landed in territory the centroids don't cover. Mirrors the
    // MinHashIndex ingest e2e; proves the new staleness/refit pieces
    // compose under Structured Streaming.
    import org.apache.spark.sql.{DataFrame, Dataset, Row}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = 8
    def vec(axis: Int, i: Int): Seq[Double] = {
      val noise = Seq.tabulate(dim)(d => ((i * 37 + d * 11) % 13 - 6) / 100.0)
      val raw = Seq.tabulate(dim)(d => (if (d == axis) 1.0 else 0.0) + noise(d))
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nrm)
    }
    val corpus = ((0 until 100).map(i => (i.toLong, vec(0, i))) ++
      (100 until 200).map(i => (i.toLong, vec(1, i)))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivf_stream").toString + "/index"
    IvfIndex.save(corpus, "vec_id", "embedding",
      IvfIndex.fit(corpus, "vec_id", "embedding", nLists = 4, iters = 3), dir)
    val refits = scala.collection.mutable.ArrayBuffer[Long]()
    val source = MemoryStream[(Long, Seq[Double])]
    val q = source.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.toDF()
        if (!b.isEmpty) {
          val drifted = IvfIndex.staleness(b, "vec_id", "embedding", dir)
            .head().getAs[Boolean]("drifted")
          IvfIndex.append(b, "vec_id", "embedding", dir)
          if (drifted) {
            IvfIndex.refit(spark, dir, "vec_id", "embedding", iters = 3)
            refits.synchronized { refits += batchId }
          }
        }
        ()
      }
      .start()
    try {
      // batch 0: in-distribution -> append only
      source.addData((200 until 230).map(i => (i.toLong, vec(0, i))): _*)
      q.processAllAvailable()
      assert(refits.isEmpty, s"in-distribution batch must not refit: $refits")
      // batch 1: a new cluster -> staleness flags, cycle refits
      source.addData((1000 until 1100).map(i => (i.toLong, vec(2, i))): _*)
      q.processAllAvailable()
      assert(refits.size === 1, s"drifted batch must trigger exactly one refit: $refits")
      // batch 2: more of the SAME new cluster -> the refit absorbed it
      source.addData((1100 until 1130).map(i => (i.toLong, vec(2, i))): _*)
      q.processAllAvailable()
      assert(refits.size === 1, s"post-refit batches must not re-flag: $refits")
    } finally q.stop()
    // the maintained index answers drifted-region queries with high recall
    val (model, lists) = IvfIndex.load(spark, dir)
    val all = corpus.unionByName(
      ((200 until 230).map(i => (i.toLong, vec(0, i))) ++
       (1000 until 1130).map(i => (i.toLong, vec(2, i)))).toDF("vec_id", "embedding"))
    val queries = (1000 until 1130 by 13).map(i => (i.toLong, vec(2, i)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(queries, all, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = IvfIndex.probeIndexed(queries, lists, "vec_id", "embedding",
        k = 5, model, nProbe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"maintained-index recall@5 = $recall")
  }

  test("compact rerun after a crash in the rename window recovers the index " +
      "instead of destroying both surviving copies") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val dir = java.nio.file.Files.createTempDirectory("ivf_crash").toString
    val model = IvfIndex.fit(emb, "vec_id", "embedding", nLists = 8, iters = 2)
    IvfIndex.save(emb, "vec_id", "embedding", model, dir)
    IvfIndex.append(emb.filter($"vec_id" % 7 === 0)
      .withColumn("vec_id", $"vec_id" + 100000L), "vec_id", "embedding", dir)
    val queries = emb.filter($"vec_id" < 10)
    def probeRows() = {
      val (m, lists) = IvfIndex.load(spark, dir)
      IvfIndex.probeIndexed(queries, lists, "vec_id", "embedding",
          k = 5, m, nProbe = 8)
        .orderBy($"query_id", $"rank").collect().map(_.toString).toSeq
    }
    val expected = probeRows()
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new Path(s"$dir/lists")
    val tmp = new Path(s"$dir/lists_compact")
    val old = new Path(s"$dir/lists_old")
    val fs = live.getFileSystem(conf)
    // manufacture the crash state: tmp fully written (content-equal copy),
    // live staged aside as old, promote never happened
    assert(FileUtil.copy(fs, live, fs, tmp, false, conf))
    assert(fs.rename(live, old))
    assert(!fs.exists(live) && fs.exists(tmp) && fs.exists(old))
    // a rerun must FIRST restore live, then complete normally
    IvfIndex.compact(spark, dir)
    assert(fs.exists(live), "live restored after crash recovery")
    assert(!fs.exists(tmp) && !fs.exists(old), "leftovers cleared")
    assert(probeRows() === expected, "recovered index probes identically")
    // the other crash flavor: only old survives (crash before tmp existed,
    // e.g. tmp was on a different volume) — recovery falls back to old
    assert(fs.rename(live, old))
    IvfIndex.compact(spark, dir)
    assert(fs.exists(live) && !fs.exists(old))
    assert(probeRows() === expected)
    // the delete branch of StagedSwap.recover at the real layout: compact
    // crashed MID-tmp-write (task files present, committer `_SUCCESS`
    // absent) after staging live aside — the truncated tmp must be
    // discarded, never promoted, and old restored as live
    assert(FileUtil.copy(fs, live, fs, tmp, false, conf))
    fs.delete(new Path(tmp, "_SUCCESS"), false)
    assert(fs.rename(live, old))
    assert(!fs.exists(live) && fs.exists(tmp) && fs.exists(old))
    IvfIndex.compact(spark, dir)
    assert(fs.exists(live) && !fs.exists(tmp) && !fs.exists(old))
    assert(probeRows() === expected,
      "old restored; the _SUCCESS-less tmp was deleted, not promoted")
  }

  test("upsertIvfOnArrival: streamed re-embeds replace, fresh ids insert, " +
      "redelivery converges, auto-compact bounds file growth") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.reverse
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivf_upstream").toString
    val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
    val model = IvfIndex.fit(emb, "vec_id", "embedding", nLists = 8, iters = 3)
    IvfIndex.save(emb, "vec_id", "embedding", model, idx)
    // bounded fixture slice drives the MemoryStream: re-embeds (reversed
    // vectors move lists) + fresh ids
    val ups = emb.filter($"vec_id" % 7 === 0 && $"vec_id" < 140)
      .select($"vec_id", reverse($"embedding").as("embedding"))
      .unionByName(emb.filter($"vec_id" < 3)
        .select(($"vec_id" + 90000L).as("vec_id"), $"embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val (b1, b2) = ups.splitAt(ups.size / 2)
    val source = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingJobs.upsertIvfOnArrival(
        source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        idx, ckpt, clearCachePerBatch = false,
        autoCompactFilesPerDir = Some(2))
      .start()
    try {
      source.addData(b1: _*); q.processAllAvailable()
      source.addData(b2: _*); q.processAllAvailable()
      source.addData(b2: _*); q.processAllAvailable() // pure redelivery
    } finally q.stop()
    assert(!graft.operators.IndexMaintenance.needsCompact(spark, idx, 2),
      "in-stream compaction must keep fragmentation under the policy")
    val rebuilt = s"$dir/rebuilt"
    val upsDf = ups.toDF("vec_id", "embedding")
    IvfIndex.save(
      emb.select($"vec_id", $"embedding")
        .join(upsDf.select($"vec_id"), Seq("vec_id"), "left_anti")
        .unionByName(upsDf),
      "vec_id", "embedding", model, rebuilt)
    val queries = emb.filter($"vec_id" < 10)
    def rows(d: String) = {
      val (m, lists) = IvfIndex.load(spark, d)
      IvfIndex.probeIndexed(queries, lists, "vec_id", "embedding",
          k = 5, m, nProbe = 8)
        .orderBy($"query_id", $"rank").collect().map(_.toString).toSeq
    }
    assert(rows(idx) === rows(rebuilt),
      "streamed upserts must equal a batch build with the replacements")
  }

  test("delete == rebuild-without under the same model; upsert moves " +
      "re-embedded ids; stats track both; idempotent") {
    import org.apache.spark.sql.functions.col
    val dirA = java.nio.file.Files.createTempDirectory("ivf_del_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("ivf_del_b").toString
    val model = IvfIndex.fit(emb, "vec_id", "embedding", nLists = 8, iters = 3)
    IvfIndex.save(emb, "vec_id", "embedding", model, dirA)
    val n0 = emb.count()
    val delIds = emb.filter($"vec_id" % 4 === 0).select($"vec_id")
    IvfIndex.delete(spark, dirA, delIds)
    IvfIndex.save(emb.filter($"vec_id" % 4 =!= 0), "vec_id", "embedding",
      model, dirB)
    val queries = emb.filter($"vec_id" < 10)
    def rows(d: String) = {
      val (m, lists) = IvfIndex.load(spark, d)
      IvfIndex.probeIndexed(queries, lists, "vec_id", "embedding",
          k = 5, m, nProbe = 8)
        .orderBy($"query_id", $"rank").collect().map(_.toString).toSeq
    }
    assert(rows(dirA) === rows(dirB),
      "post-delete probe must equal rebuild-without under the same model")
    // deleted ids never surface
    val (mA, listsA) = IvfIndex.load(spark, dirA)
    assert(listsA.filter($"vec_id" % 4 === 0).count() === 0)
    // idempotent; absent ids no-op
    IvfIndex.delete(spark, dirA, delIds)
    assert(rows(dirA) === rows(dirB))
    // stats reflect the deletion, exactly
    val s = IvfIndex.stats(spark, dirA)
      .as[(String, Long)].collect().toMap
    assert(s("vec_rows") === emb.filter($"vec_id" % 4 =!= 0).count())
    assert(s("n_lists") === 8L)
    assert(s("nonempty_lists") >= 1 && s("nonempty_lists") <= 8)
    assert(s("min_list_size") >= 1 && s("min_list_size") <= s("max_list_size"))
    // upsert: re-embed some survivors with different vectors + new ids
    val ups = emb.filter($"vec_id" % 4 === 1 && $"vec_id" < 80)
      .select($"vec_id", org.apache.spark.sql.functions.reverse($"embedding").as("embedding"))
      .unionByName(emb.filter($"vec_id" < 5)
        .select(($"vec_id" + 90000L).as("vec_id"), $"embedding"))
    IvfIndex.upsert(ups, "vec_id", "embedding", dirA)
    val dirC = java.nio.file.Files.createTempDirectory("ivf_ups_c").toString
    IvfIndex.save(
      emb.select($"vec_id", $"embedding").filter($"vec_id" % 4 =!= 0)
        .join(ups.select($"vec_id"), Seq("vec_id"), "left_anti")
        .unionByName(ups),
      "vec_id", "embedding", model, dirC)
    assert(rows(dirA) === rows(dirC),
      "post-upsert probe must equal rebuild-with-replacements")
    // emptying delete rejected
    intercept[IllegalArgumentException] {
      IvfIndex.delete(spark, dirC, spark.read.parquet(s"$dirC/lists")
        .select($"vec_id"))
    }
  }
}
