package graft

import org.apache.spark.sql.functions._

import graft.operators.ProductQuantizer

/** Product quantization: codebook shape, the exact ADC identity
  * (ADC(q,x) == distance to x's reconstruction), lossless encoding of
  * vectors that ARE codebook concatenations, and the recall floor on
  * clustered data. All fixtures are deterministic (hash-derived noise,
  * seeded k-means), so every assertion is replayable. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic unit noise in [-amp, amp] from (tag, i, d). */
  private def noise(tag: String, i: Int, d: Int, amp: Double): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$i:$d".getBytes("UTF-8"))
    (((h(0) & 0xff) * 256 + (h(1) & 0xff)).toDouble / 65535.0 * 2 - 1) * amp
  }

  // 8 well-separated cluster centers in 16 dims; 200 corpus vectors
  private val dim = 16
  private def center(c: Int, d: Int): Double =
    if (d % 8 == c % 8) 10.0 + c else 0.0
  private def corpusVec(i: Int): Array[Double] = {
    val c = i % 8
    Array.tabulate(dim)(d => center(c, d) + noise("corpus", i, d, 0.05))
  }
  private lazy val corpus = (0 until 200)
    .map(i => (i.toLong, corpusVec(i).toSeq)).toDF("vec_id", "embedding")
  private lazy val model =
    ProductQuantizer.fit(corpus, "vec_id", "embedding", m = 4, k = 8, iters = 3)

  test("fit rejects a subspace count that does not divide the dim") {
    intercept[IllegalArgumentException] {
      ProductQuantizer.fit(corpus, "vec_id", "embedding", m = 5, k = 4, iters = 1)
    }
  }

  test("codebook is m subspaces of k centroids of D/m dims; codes in range") {
    val cb = ProductQuantizer.collectCodebook(model)
    assert(cb.length === 4)
    assert(cb.forall(_.length === 8), "every subspace keeps all 8 clusters")
    assert(cb.forall(_.forall(_.length === 4)))
    val codes = ProductQuantizer.encode(corpus, "vec_id", "embedding", model)
      .select($"codes").as[Seq[Int]].collect()
    assert(codes.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 8)))
  }

  test("ADC distance == exact distance to the reconstruction, and is exact " +
      "for vectors that are codebook concatenations") {
    val cb = ProductQuantizer.collectCodebook(model)
    val subDim = dim / 4
    val encoded = ProductQuantizer.encode(corpus, "vec_id", "embedding", model)
    val queries = corpus.filter($"vec_id" < 3)
    val got = ProductQuantizer.adcTopK(queries, "vec_id", "embedding",
        encoded, "vec_id", model, k = 200)
      .select($"query_id", $"id", $"approx_dist")
      .as[(Long, Long, Double)].collect()
      .map { case (q, i, dd) => (q, i) -> dd }.toMap
    val codeMap = encoded.select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    val vecMap = (0 until 200).map(i => i.toLong -> corpusVec(i)).toMap
    // the identity: ADC(q, x) == sum_s ||q_s - c_{s, code_s(x)}||^2
    for (q <- 0L until 3L; x <- Seq(0L, 7L, 13L, 199L)) {
      val expect = (0 until 4).map { s =>
        val c = cb(s)(codeMap(x)(s))
        (0 until subDim).map { d =>
          val diff = vecMap(q)(s * subDim + d) - c(d); diff * diff
        }.sum
      }.sum
      assert(math.abs(got((q, x)) - expect) < 1e-9,
        s"ADC identity broken for query $q corpus $x")
    }
    // a query that IS its own reconstruction has ADC self-distance 0
    val recon = (0 until 4).flatMap(s => cb(s)(codeMap(5L)(s))).toArray
    val rq = Seq((999L, recon.toSeq)).toDF("vec_id", "embedding")
    val self = ProductQuantizer.adcTopK(rq, "vec_id", "embedding",
        encoded, "vec_id", model, k = 1)
      .select($"id", $"approx_dist").as[(Long, Double)].head()
    assert(self._2 < 1e-12, "reconstruction must be at ADC distance zero")
  }

  test("IVFADC limit identity: nProbe = nLists reproduces plain ADC bit for bit") {
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    val indexed = graft.operators.KMeans
      .assign(ProductQuantizer.encode(corpus, "vec_id", "embedding", model)
        .join(corpus, "vec_id"), "embedding", coarse)
      .withColumnRenamed("cluster_id", "list_id")
      .select($"vec_id", $"codes", $"list_id")
    val queries = corpus.filter($"vec_id" < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"rank", $"id", $"approx_dist")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val full = rows(ProductQuantizer.adcTopK(
      queries, "vec_id", "embedding", indexed, "vec_id", model, k = 7))
    val ivfFull = rows(ProductQuantizer.ivfAdcTopK(
      queries, "vec_id", "embedding", indexed, "vec_id", model, coarse,
      k = 7, nProbe = 8))
    assert(ivfFull === full,
      "probing every cell must reduce IVFADC to the exact ADC scan")
    // sparse probe on clustered data: the query's own cell is probed
    // first, so the shortlist still contains the true neighbors
    val sparse = rows(ProductQuantizer.ivfAdcTopK(
      queries, "vec_id", "embedding", indexed, "vec_id", model, coarse,
      k = 7, nProbe = 2))
    val sparseSets = sparse.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val fullSets = full.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val overlap = fullSets.map { case (q, ids) =>
      sparseSets(q).intersect(ids).size.toDouble / ids.size
    }
    assert(overlap.sum / overlap.size >= 0.8,
      s"sparse-probe shortlist lost the clustered neighbors: $overlap")
  }

  test("fitResidual is bit-identical across reruns (the concurrent " +
      "subspace fits must not race the residual lambda chain)") {
    // regression: the m subspace fits run as concurrent jobs; before the
    // pre-fan-out materialization in ProductQuantizer.fit, driver-side
    // folding of the zip_with residual raced its shared
    // NamedLambdaVariable slots and whole Lloyd trajectories diverged
    // run to run
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    def sig(): Seq[(Int, Long, Long, Double, Long)] =
      ProductQuantizer.fitResidual(
          corpus, "vec_id", "embedding", coarse, m = 4, k = 8, iters = 3)
        .select($"subspace".cast("int"), $"cluster_id", $"dim", $"centroid",
          $"n_members")
        .as[(Int, Long, Long, Double, Long)].collect()
        .sortBy(r => (r._1, r._2, r._3)).toSeq
    val a = sig()
    for (i <- 1 to 2) assert(sig() === a, s"fitResidual diverged on rerun $i")
  }

  test("residual encoding: tighter reconstruction than raw codes, recall floor holds") {
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    // raw-codes artifact (the q193 path)
    val rawIndexed = graft.operators.KMeans
      .assign(ProductQuantizer.encode(corpus, "vec_id", "embedding", model)
        .join(corpus, "vec_id"), "embedding", coarse)
      .withColumnRenamed("cluster_id", "list_id")
      .select($"vec_id", $"codes", $"list_id")
    // residual artifact: codebook fitted on x - c(cell(x))
    val residModel = ProductQuantizer.fitResidual(
      corpus, "vec_id", "embedding", coarse, m = 4, k = 8, iters = 3)
    val residIndexed = ProductQuantizer.encodeResidual(
      corpus, "vec_id", "embedding", coarse, residModel)
    // self-distance = quantization (reconstruction) error: querying each
    // vector against its own code, nProbe 1 hits its own cell
    def selfErr(res: org.apache.spark.sql.DataFrame): Double = {
      val m = res.filter($"query_id" === $"id")
        .select($"approx_dist").as[Double].collect()
      assert(m.length === 200, "every vector must find its own code")
      m.sum / m.length
    }
    // k = full corpus: same-cluster rows share codes, so the self row can
    // tie arbitrarily deep — filter it out of the full ranking instead
    val rawErr = selfErr(ProductQuantizer.ivfAdcTopK(
      corpus, "vec_id", "embedding", rawIndexed, "vec_id", model, coarse,
      k = 200, nProbe = 1))
    val residErr = selfErr(ProductQuantizer.ivfAdcTopKResidual(
      corpus, "vec_id", "embedding", residIndexed, "vec_id", residModel,
      coarse, k = 200, nProbe = 1))
    assert(residErr < rawErr,
      s"residual codes must reconstruct tighter: $residErr vs raw $rawErr")
    // shortlist recall: exact top-10 inside residual-IVFADC top-30 at
    // a 2-of-8 probe
    val queries = (0 until 5).map { i =>
      val c = i % 8
      (1000L + i, Array.tabulate(dim)(d => center(c, d) + noise("q", i, d, 0.05)).toSeq)
    }
    val got = ProductQuantizer.ivfAdcTopKResidual(
        queries.toDF("vec_id", "embedding"), "vec_id", "embedding",
        residIndexed, "vec_id", residModel, coarse, k = 30, nProbe = 2)
      .select($"query_id", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val vecMap = (0 until 200).map(i => i.toLong -> corpusVec(i)).toMap
    val recalls = queries.map { case (qid, qv) =>
      val exact = vecMap.toSeq.map { case (i, x) =>
        i -> x.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (i, dd) => (dd, i) }.take(10).map(_._1).toSet
      exact.intersect(got(qid)).size / 10.0
    }
    assert(recalls.sum / recalls.length >= 0.9,
      s"residual shortlist recall below 0.9: $recalls")
  }

  test("persisted index: probeSaved == in-memory IVFADC; append visible; compact preserves") {
    val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    val residModel = ProductQuantizer.fitResidual(
      corpus, "vec_id", "embedding", coarse, m = 4, k = 8, iters = 3)
    ProductQuantizer.save(corpus, "vec_id", "embedding", coarse, residModel,
      dir, residual = true)
    val queries = corpus.filter($"vec_id" < 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"rank", $"id", $"approx_dist")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val inMem = rows(ProductQuantizer.ivfAdcTopKResidual(
      queries, "vec_id", "embedding",
      ProductQuantizer.encodeResidual(corpus, "vec_id", "embedding", coarse,
        residModel),
      "vec_id", residModel, coarse, k = 6, nProbe = 3))
    val saved = rows(ProductQuantizer.probeSaved(
      queries, "vec_id", "embedding", spark, dir, k = 6, nProbe = 3))
    assert(saved === inMem,
      "the persisted index must answer exactly like the in-memory path")
    // append a new vector near cluster 2's center: it must surface for a
    // cluster-2 query after append, unchanged after compact
    val newVec = (9999L, Array.tabulate(dim)(d => center(2, d) + 0.01).toSeq)
    ProductQuantizer.append(Seq(newVec).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    val q2 = Seq((5000L, Array.tabulate(dim)(d => center(2, d)).toSeq))
      .toDF("vec_id", "embedding")
    // k deep enough to clear the same-code tie group (ties rank by id
    // asc, and 9999 is the largest id in its cell)
    def hit(): Boolean = ProductQuantizer.probeSaved(
        q2, "vec_id", "embedding", spark, dir, k = 100, nProbe = 1)
      .select($"id").as[Long].collect().contains(9999L)
    assert(hit(), "appended vector must be probe-visible")
    val before = rows(ProductQuantizer.probeSaved(
      queries, "vec_id", "embedding", spark, dir, k = 6, nProbe = 3))
    ProductQuantizer.compact(spark, dir)
    assert(hit(), "compact must preserve the appended vector")
    assert(rows(ProductQuantizer.probeSaved(
      queries, "vec_id", "embedding", spark, dir, k = 6, nProbe = 3)) === before,
      "compact must not change any probe answer")
  }

  test("upsert == rebuild-with-replacements under the same codebooks: " +
      "re-embedded vectors move cells, fresh ids insert") {
    val dirA = java.nio.file.Files.createTempDirectory("pq_ups_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("pq_ups_b").toString
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    ProductQuantizer.save(corpus, "vec_id", "embedding", coarse, model,
      dirA, residual = false)
    // vec_id % 7 == 0 re-embedded into a DIFFERENT cluster's
    // neighborhood; 500-504 are new vectors
    val ups = (
      (0 until 200).filter(_ % 7 == 0)
        .map(i => (i.toLong, corpusVec(i + 1).toSeq)) ++
      (500 to 504).map(i => (i.toLong, corpusVec(i).toSeq))
    ).toDF("vec_id", "embedding")
    ProductQuantizer.upsert(ups, "vec_id", "embedding", dirA)
    val replaced = corpus.filter($"vec_id" % 7 =!= 0).unionByName(ups)
    ProductQuantizer.save(replaced, "vec_id", "embedding", coarse, model,
      dirB, residual = false)
    val queries = corpus.filter($"vec_id" < 4)
    def rows(dir: String) = ProductQuantizer.probeSaved(
        queries, "vec_id", "embedding", spark, dir, k = 10, nProbe = 8)
      .select($"query_id", $"rank", $"id", $"approx_dist")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val got = rows(dirA)
    assert(got === rows(dirB),
      "post-upsert probe must equal the rebuilt-with-replacements index")
    // idempotent rerun
    ProductQuantizer.upsert(ups, "vec_id", "embedding", dirA)
    assert(rows(dirA) === got)
  }

  test("upsertVectorsOnArrival: streamed re-embeds replace, fresh ids " +
      "insert, redelivery converges to the batch-built index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("pq_stream").toString
    val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    ProductQuantizer.save(corpus, "vec_id", "embedding", coarse, model,
      idx, residual = false)
    val source = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingJobs.upsertVectorsOnArrival(
        source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        idx, ckpt, clearCachePerBatch = false)
      .start()
    try {
      // batch 1: ids 0/7/14 re-embedded into other cells, 300-302 fresh
      val ups = ((0 until 200 by 7).map(i => (i.toLong, corpusVec(i + 1).toSeq))
        ++ (300 to 302).map(i => (i.toLong, corpusVec(i).toSeq)))
      source.addData(ups: _*)
      q.processAllAvailable()
      // batch 2: pure redelivery — upsert idempotence must hold streamed
      source.addData(ups: _*)
      q.processAllAvailable()
      val replaced = corpus.filter($"vec_id" % 7 =!= 0)
        .unionByName(ups.toDF("vec_id", "embedding"))
      val rebuilt = s"$dir/rebuilt"
      ProductQuantizer.save(replaced, "vec_id", "embedding", coarse, model,
        rebuilt, residual = false)
      val queries = corpus.filter($"vec_id" < 4)
      def rows(p: String) = ProductQuantizer.probeSaved(
          queries, "vec_id", "embedding", spark, p, k = 10, nProbe = 8)
        .collect().toSeq.sortBy(_.toString)
      assert(rows(idx) === rows(rebuilt),
        "streamed upserts must equal a batch build with the replacements")
    } finally q.stop()
  }

  test("auto-compact on upsertVectorsOnArrival: file growth bounded by " +
      "the policy, answers unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("pq_upac").toString
    val (idx, ckpt) = (s"$dir/index", s"$dir/ckpt")
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    ProductQuantizer.save(corpus, "vec_id", "embedding", coarse, model,
      idx, residual = false)
    val source = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingJobs.upsertVectorsOnArrival(
        source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        idx, ckpt, clearCachePerBatch = false,
        autoCompactFilesPerDir = Some(2))
      .start()
    try {
      val fresh = (0 until 6).map(b =>
        (300 + b * 10 until 300 + b * 10 + 5).map(i =>
          (i.toLong, corpusVec(i).toSeq)))
      fresh.foreach { batch =>
        source.addData(batch: _*)
        q.processAllAvailable()
      }
      assert(!graft.operators.IndexMaintenance.needsCompact(spark, idx, 2),
        "in-stream compaction must keep fragmentation under the policy")
      val rebuilt = s"$dir/rebuilt"
      ProductQuantizer.save(
        corpus.unionByName(fresh.flatten.toDF("vec_id", "embedding")),
        "vec_id", "embedding", coarse, model, rebuilt, residual = false)
      val queries = corpus.filter($"vec_id" < 4)
      def rows(p: String) = ProductQuantizer.probeSaved(
          queries, "vec_id", "embedding", spark, p, k = 10, nProbe = 8)
        .collect().toSeq.sortBy(_.toString)
      assert(rows(idx) === rows(rebuilt),
        "compacted streamed index must equal the batch build")
    } finally q.stop()
  }

  test("compact heals multi-file parameter artifacts (pre-coalesce saves): " +
      "the policy flag clears instead of re-triggering forever") {
    val dir = java.nio.file.Files.createTempDirectory("pq_heal").toString
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    ProductQuantizer.save(corpus, "vec_id", "embedding", coarse, model,
      dir, residual = false)
    val queries = corpus.filter($"vec_id" < 3)
    def rows() = ProductQuantizer.probeSaved(queries, "vec_id", "embedding",
        spark, dir, k = 5, nProbe = 8)
      .collect().toSeq.sortBy(_.toString)
    val r0 = rows()
    // simulate an old-format index: rewrite coarse/ multi-file
    val old = spark.read.parquet(s"$dir/coarse").cache()
    old.count()
    old.repartition(6).write.mode("overwrite").parquet(s"$dir/coarse")
    old.unpersist()
    assert(graft.operators.IndexMaintenance.needsCompact(spark, dir, 2),
      "fixture: the multi-file parameter artifact must trip the policy")
    ProductQuantizer.compact(spark, dir)
    assert(!graft.operators.IndexMaintenance.needsCompact(spark, dir, 2),
      "compact must clear every artifact the policy flags")
    assert(rows() === r0, "healing must not change answers")
  }

  test("stats: cell-balance invariants over save + append") {
    val dir = java.nio.file.Files.createTempDirectory("pq_stats").toString
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    ProductQuantizer.save(corpus.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", coarse, model, dir, residual = false)
    ProductQuantizer.append(corpus.filter($"vec_id" % 2 === 1),
      "vec_id", "embedding", dir)
    val s = ProductQuantizer.stats(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(s("code_rows") === corpus.count())
    assert(s("n_lists") >= 1 && s("n_lists") <= 8)
    assert(s("min_cell_size") >= 1 &&
      s("min_cell_size") <= s("max_cell_size"))
    assert(s("max_cell_size") <= s("code_rows"))
    assert(s("m") === 4)
    assert(s("residual") === 0)
    assert(s("pq_codebook_rows") > 0)
  }

  test("delete: probeSaved == an index saved without the ids under the SAME " +
      "codebooks; deleted ids never surface; other answers re-rank exactly") {
    val dirA = java.nio.file.Files.createTempDirectory("pq_del_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("pq_del_b").toString
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    val delIds = corpus.filter($"vec_id" % 3 === 0).select($"vec_id")
    ProductQuantizer.save(corpus, "vec_id", "embedding", coarse, model,
      dirA, residual = false)
    ProductQuantizer.delete(spark, dirA, delIds)
    // reference: the same codebooks over the surviving corpus (codebooks
    // are distribution fits, untouched by delete — the documented contract)
    ProductQuantizer.save(corpus.filter($"vec_id" % 3 =!= 0),
      "vec_id", "embedding", coarse, model, dirB, residual = false)
    val queries = corpus.filter($"vec_id" < 4)
    def rows(dir: String) = ProductQuantizer.probeSaved(
        queries, "vec_id", "embedding", spark, dir, k = 10, nProbe = 3)
      .select($"query_id", $"rank", $"id", $"approx_dist")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val got = rows(dirA)
    assert(got === rows(dirB),
      "post-delete probe must equal the rebuilt-without-ids index")
    assert(!got.exists(_._3 % 3 == 0), "a deleted id surfaced in a probe")
    // idempotent rerun
    ProductQuantizer.delete(spark, dirA, delIds)
    assert(rows(dirA) === got)
    // compact after delete must not resurrect deleted codes or move answers
    ProductQuantizer.compact(spark, dirA)
    assert(rows(dirA) === got, "compact changed post-delete probe answers")
  }

  test("filtered probe: idFilter == probing an index built from only the " +
      "allowed ids; disallowed ids never surface; full k within the filter") {
    val dirA = java.nio.file.Files.createTempDirectory("pq_flt_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("pq_flt_b").toString
    val coarse = graft.operators.KMeans.fit(corpus, "vec_id", "embedding",
      k = 8, iters = 3)
    val allowed = corpus.filter($"vec_id" % 2 === 0).select($"vec_id")
    ProductQuantizer.save(corpus, "vec_id", "embedding", coarse, model,
      dirA, residual = false)
    // reference: an index holding ONLY the allowed ids under the same
    // codebooks — filtered search must equal search over that restriction
    ProductQuantizer.save(corpus.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", coarse, model, dirB, residual = false)
    val queries = corpus.filter($"vec_id" < 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"rank", $"id", $"approx_dist")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val got = rows(ProductQuantizer.probeSaved(
      queries, "vec_id", "embedding", spark, dirA, k = 10, nProbe = 8,
      idFilter = Some(allowed)))
    assert(got === rows(ProductQuantizer.probeSaved(
      queries, "vec_id", "embedding", spark, dirB, k = 10, nProbe = 8)),
      "filtered probe must equal probing the allowed-only index")
    assert(got.forall(_._3 % 2 == 0), "a disallowed id surfaced")
    // top-k WITHIN the filter: every query still gets its full k — the
    // semantics a post-filter on an unfiltered top-k cannot give
    assert(got.groupBy(_._1).forall(_._2.size == 10),
      "filtered probe must return k results per query, not post-filtered stragglers")
    assert(intercept[IllegalArgumentException] {
      ProductQuantizer.probeSaved(queries, "vec_id", "embedding", spark,
        dirA, k = 10, nProbe = 8,
        idFilter = Some(corpus.select($"vec_id", $"embedding")))
    }.getMessage.contains("one-column"))
  }

  test("shortlist recall: exact top-10 is inside the ADC top-30 candidates") {
    // the production PQ contract is shortlist-then-rerank: ADC cannot
    // rank near-ties WITHIN a cluster (same-cluster members share codes,
    // by design — the noise is exactly what quantization discards), but
    // the shortlist it returns must contain the true neighbors for the
    // exact rerank to find. 3x over-fetch, >= 0.9 shortlist recall.
    val encoded = ProductQuantizer.encode(corpus, "vec_id", "embedding", model)
    val queries = (0 until 5).map { i =>
      val c = i % 8
      (1000L + i, Array.tabulate(dim)(d => center(c, d) + noise("q", i, d, 0.05)).toSeq)
    }
    val got = ProductQuantizer.adcTopK(
        queries.toDF("vec_id", "embedding"), "vec_id", "embedding",
        encoded, "vec_id", model, k = 30)
      .select($"query_id", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val vecMap = (0 until 200).map(i => i.toLong -> corpusVec(i)).toMap
    val recalls = queries.map { case (qid, qv) =>
      val exact = vecMap.toSeq.map { case (i, x) =>
        i -> x.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (i, dd) => (dd, i) }.take(10).map(_._1).toSet
      exact.intersect(got(qid)).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean shortlist recall $mean below 0.9 ($recalls)")
  }

  test("adcTopK ≡ the per-query window over adcDistances (the q211 frame)") {
    import org.apache.spark.sql.expressions.Window
    val codes = ProductQuantizer.encode(corpus, "vec_id", "embedding", model)
    val queries = corpus.filter($"vec_id" < 6)
    val viaOp = ProductQuantizer.adcTopK(queries, "vec_id", "embedding",
        codes, "vec_id", model, k = 7)
      .select($"query_id", $"rank".cast("long"), $"id", $"approx_dist")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy($"query_id")
      .orderBy($"approx_dist".asc, $"id".asc)
    val viaFrame = ProductQuantizer.adcDistances(queries, "vec_id",
        "embedding", codes, "vec_id", model)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 7)
      .select($"query_id", $"rank", $"id", $"approx_dist")
      .collect().map(_.toSeq).toSet
    assert(viaOp === viaFrame)
  }
}
