package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index for INCREMENTAL near-dup screening: build
  * the index once over the standing corpus, then test every arriving batch
  * against it without touching the corpus text again — the continuous
  * form of the reference's dedup-before-insert contract
  * (`api_rapid/insert_csv_to_postgres.py:61`), upgraded from exact rows
  * to near-duplicates. The batch/probe split mirrors [[IvfIndex]]'s
  * fit/probe: the expensive global pass happens once at build time,
  * per-batch cost is proportional to the batch.
  *
  * On-disk layout under `path`:
  *  - `bands/`  (band_hash, id) parquet, partitionBy(band_idx) — the LSH
  *    buckets. 16 longs + an id per doc; at 100 TB of text this index is
  *    ~0.1% of the corpus.
  *  - `sigs/`   (id, sig: array<long>) — full k-min signatures for
  *    verification by the standard MinHash estimator (fraction of equal
  *    signature positions), so probing never needs corpus text.
  *  - `meta/`   one row (n, k, bands, seed) — probe reads its parameters
  *    from here; a batch probed with different hashing than the index was
  *    built with would silently match nothing.
  *
  * Scale shape of [[probe]]: batch signatures/bands compute row-local;
  * the only exchanges are the (band_idx, band_hash) bucket join, the
  * candidate (batch_id, corpus_id) distinct, and two id-keyed signature
  * rejoins. Nothing ever shuffles a signature array or document text —
  * the same discipline as the LSH-ANN and fuzzy-join candidate stages.
  *
  * Estimator, not exact: a probe hit means estimated Jaccard >= the
  * threshold (unbiased, stderr ~ sqrt(j(1-j)/k) ≈ 0.06 at k=64). Route
  * hits into an exact verification against gathered text if the policy
  * needs certainty; [[dropSeenNearDups]] takes the estimate as-is, which
  * is the usual curation choice (biased toward removal). */
object MinHashIndex {

  /** LSH bands of a signature frame: (id, band_idx, band_hash). */
  private def banded(sigs: DataFrame, idCol: String, k: Int,
      bands: Int): DataFrame = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide the signature length k ($k)")
    val r = k / bands
    val bandCols = (0 until bands).map(b => xxhash64(slice(col("sig"), b * r + 1, r)))
    sigs.select(col(idCol).as("id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
  }

  /** Build and persist the index over `docs`. Overwrites `path`. Meta is
    * written LAST and atomically (under [[StagedSwap]], the
    * [[TextIndex]] discipline): meta is this family's only
    * corpus-parameter artifact and no mutation after save ever rewrites
    * it, so "meta readable" ⟺ "a save once completed here" — the signal
    * a restarting ingest stream keys its cold-start decision on. A
    * plain overwrite's delete-then-write window would break that
    * inference. */
  def save(docs: DataFrame, idCol: String, textCol: String, path: String,
      n: Int = 3, k: Int = 64, bands: Int = 16, seed: Long = 42L): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(docs, idCol, textCol, n, k, seed)
      .select(col(idCol).as("id"), col("sig")).cache()
    try {
      // materialize the signature cache ONCE, then the two artifact
      // writes (disjoint subdirs, both reading the cache) run as
      // concurrent jobs (§2.6, r17) — sequential writes serialized two
      // cache scans behind one driver thread. Meta still lands LAST.
      sigs.count()
      graft.core.Concurrency.runAll(Seq(
        () => sigs.write.mode("overwrite").parquet(s"$path/sigs"),
        // band-aligned write (the compact layout): one file per band dir,
        // not input-partitions × bands small files — a fresh save must
        // not instantly flag IndexMaintenance.needsCompact
        () => banded(sigs, "id", k, bands)
          .repartition(bands, col("band_idx"))
          .write.mode("overwrite")
          .option("maxRecordsPerFile", graft.core.IndexLayout.maxRecordsPerFile)
          .partitionBy("band_idx").parquet(s"$path/bands")))
      StagedSwap.swapSub(spark, path, "meta", "_del") { tmp =>
        Seq((n, k, bands, seed)).toDF("n", "k", "bands", "seed")
          .coalesce(1).write.parquet(tmp)
      }
    } finally sigs.unpersist()
  }

  /** Writer-restart repair — the [[TextIndex.recover]] discipline on
    * this family's swapped artifacts (sigs, bands, meta). */
  def recover(spark: SparkSession, path: String): Unit =
    Seq("sigs", "bands", "meta").foreach(StagedSwap.recoverSub(spark, path, _))

  /** Admit a new batch into an EXISTING index: append its signatures and
    * bands (parquet append — partitionBy(band_idx) layouts merge
    * file-wise, no rewrite of standing data). The continuous-ingest
    * cycle is probe → drop hits → append survivors; see
    * StreamingJobs/MinHashIndexSpec for the foreachBatch composition.
    * Caller screens the batch FIRST if near-dups should not enter. */
  def append(newDocs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    recover(spark, path)
    val (n, k, bands, seed) = meta(spark, path)
    val sigs = Dedup.minhashSignatures(newDocs, idCol, textCol, n, k, seed)
      .select(col(idCol).as("id"), col("sig")).cache()
    try {
      // sequential, NOT overlapped (the TextIndex.append lesson, r17):
      // an ingest stream's batch lineage reads THIS index (the probe's
      // sigs/bands scans), and a concurrent artifact commit recaches the
      // cached signature frame mid-wave — the sibling write then
      // recomputes over a self-excluding listing. save() overlaps
      // safely; append must keep the strict sigs → bands order.
      sigs.write.mode("append").parquet(s"$path/sigs")
      banded(sigs, "id", k, bands)
        .repartition(bands, col("band_idx"))
        .write.mode("append")
        .option("maxRecordsPerFile", graft.core.IndexLayout.maxRecordsPerFile)
        .partitionBy("band_idx").parquet(s"$path/bands")
    } finally sigs.unpersist()
  }

  /** Upsert (replace-or-insert) a batch — the document-edited path:
    * delete(batch ids) then append(batch), so re-ingested docs carry
    * their NEW signatures and absent ids are plain inserts. Contract
    * (MinHashIndexSpec): post-upsert probe ≡ probe of an index rebuilt
    * with the batch replacing its ids. Crash between the halves leaves
    * the batch ids absent (never stale dual-signature); the same upsert
    * rerun is idempotent and completes it. Single-writer. */
  def upsert(batch: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    delete(batch.sparkSession, path, batch.select(col(idCol)))
    append(batch, idCol, textCol, path)
  }

  /** Targeted delete (right-to-be-forgotten): remove `ids` (a one-column
    * frame) from the index without a rebuild — `sigs/` and `bands/`
    * rewrite filtered under the crash-safe [[StagedSwap]]. Signatures
    * and bands are strictly per-row artifacts (no corpus-level stats to
    * correct, unlike [[TextIndex.delete]]), so post-delete probe is
    * EXACTLY probe of an index rebuilt without the ids
    * (MinHashIndexSpec pins it). Crash window: a crash between the two
    * swaps leaves deleted ids in one artifact but not the other — a
    * band hit whose signature is gone drops out of the candidate join
    * (inner on id), so deleted ids never surface mid-repair; re-running
    * the same delete is idempotent and completes it. Single-writer, no
    * concurrent append/probe during the swap (same as [[compact]]). */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    require(ids.columns.length == 1,
      s"ids must be a one-column frame, got ${ids.columns.toSeq}")
    recover(spark, path)
    val del = ids.toDF("__del_id").distinct().cache()
    try {
      // same emptying guard as the other families: a zero-row rewrite
      // under partitionBy writes NO data files (just _SUCCESS), bricking
      // every future probe/stats with an unreadable-schema error
      require(spark.read.parquet(s"$path/sigs")
          .join(del, col("id") === col("__del_id"), "left_anti")
          .head(1).nonEmpty,
        "delete would empty the index; drop the index directory instead")
      def swapSub(sub: String)(write: String => Unit): Unit =
        StagedSwap.swapSub(spark, path, sub, "_del")(write)
      // disjoint subdirs, both reading pre-swap state + the cached
      // delete set: run the two rewrites as concurrent Spark jobs
      // (§2.6). The documented crash contract already covers either
      // artifact landing first (deleted ids in one but not the other
      // never surface — the candidate join is inner on id).
      graft.core.Concurrency.runAll(Seq(
        () => swapSub("sigs") { tmp =>
          spark.read.parquet(s"$path/sigs")
            .join(del, col("id") === col("__del_id"), "left_anti")
            .write.parquet(tmp)
        },
        () => swapSub("bands") { tmp =>
          // no repartition: a broadcast anti-join over a band-aligned
          // layout keeps input partitioning, so the rewrite stays aligned
          // for free (the TextIndex.delete rationale)
          spark.read.parquet(s"$path/bands")
            .join(del, col("id") === col("__del_id"), "left_anti")
            .write.partitionBy("band_idx").parquet(tmp)
        }))
    } finally del.unpersist()
  }

  /** Compact an index that has accreted small files through [[append]]:
    * every ingest micro-batch adds one file set per band partition, so
    * thousands of batches turn `bands/` into thousands of tiny files per
    * band and probe cost becomes file-open-bound. Rewrites `bands/` to
    * ~one file per band partition and `sigs/` to size-proportional file
    * counts, preserving contents exactly (spec-pinned: probe results are
    * identical pre/post).
    *
    * Single-writer contract (same as [[append]]): no concurrent probe or
    * append may run during the swap — the rewrite stages into a sibling
    * directory and swaps via the crash-safe [[StagedSwap]] (never a mixed
    * read; a crash in the rename window is repaired by the next compact's
    * recovery step, which restores the live directory from the surviving
    * copy before deleting anything). */
  def compact(spark: SparkSession, path: String): Unit = {
    recover(spark, path)
    val (_, _, bands, _) = meta(spark, path)
    val conf = spark.sparkContext.hadoopConfiguration
    def swap(sub: String)(write: String => Unit): Unit =
      StagedSwap.swapSub(spark, path, sub, "_compact")(write)
    // disjoint subdirs, content-preserving rewrites: concurrent jobs
    // (§2.6) — a crash leaving one artifact compacted and the other not
    // is a valid (identical-content) state
    graft.core.Concurrency.runAll(Seq(
      () => swap("bands") { tmp =>
        // repartition on band_idx: each task holds whole band partitions,
        // so partitionBy emits ~one file per band directory
        spark.read.parquet(s"$path/bands")
          .repartition(bands, col("band_idx"))
          .write.partitionBy("band_idx")
          .option("maxRecordsPerFile", graft.core.IndexLayout.maxRecordsPerFile)
          .parquet(tmp)
      },
      () => swap("sigs") { tmp =>
        // ~128 MB-target file count from the on-disk byte size, min 1
        val live = new org.apache.hadoop.fs.Path(s"$path/sigs")
        val bytes = live.getFileSystem(conf).getContentSummary(live).getLength
        val nFiles = math.max(1L, bytes / (128L << 20)).toInt
        spark.read.parquet(s"$path/sigs").repartition(nFiles).write.parquet(tmp)
      }))
  }

  private def meta(spark: SparkSession, path: String): (Int, Int, Int, Long) = {
    val row = spark.read.parquet(s"$path/meta").head()
    (row.getAs[Int]("n"), row.getAs[Int]("k"), row.getAs[Int]("bands"),
      row.getAs[Long]("seed"))
  }

  /** The index's persisted hash parameters (n, k, bands, seed) — for
    * callers that must run OTHER minhash machinery consistently with
    * this index (e.g. the streaming gate's intra-batch pair stage). */
  def params(spark: SparkSession, path: String): (Int, Int, Int, Long) =
    meta(spark, path)

  /** Operational snapshot — one (stat, value) row per metric, exact
    * longs (the [[TextIndex.stats]] dashboard discipline):
    *
    *  - `sig_rows`: indexed documents. `band_rows` must equal
    *    sig_rows × bands; drift between the two is the staleness signal
    *    of a crash between [[append]]'s two writes.
    *  - `distinct_banded_ids`: ids present in the band layout (the other
    *    side of the same invariant).
    *  - `max_bucket_size`: occupancy of the fullest (band_idx,
    *    band_hash) bucket — THE skew number for probe cost: a probe
    *    joining into a pathological bucket (e.g. a boilerplate-heavy
    *    corpus hashing many docs identically) pays candidates
    *    proportional to it. Watch it grow; split/shard when it runs hot.
    *  - `n`/`k`/`bands`/`seed`: the hash parameters (from meta). */
  def stats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (n, k, bands, seed) = meta(spark, path)
    val sigRows = spark.read.parquet(s"$path/sigs").count()
    val b = spark.read.parquet(s"$path/bands")
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")), countDistinct(col("band_idx"), col("band_hash")),
        max(col("c"))).collect().head
    val distinctIds = spark.read.parquet(s"$path/bands")
      .select(col("id")).distinct().count()
    Seq(
      "sig_rows" -> sigRows,
      "band_rows" -> b.getLong(0),
      "nonempty_buckets" -> b.getLong(1),
      "max_bucket_size" -> b.getLong(2),
      "distinct_banded_ids" -> distinctIds,
      "n" -> n.toLong,
      "k" -> k.toLong,
      "bands" -> bands.toLong,
      "seed" -> seed
    ).toDF("stat", "value")
  }

  /** Probe a batch against the index: every (batch id, corpus id) pair
    * whose estimated Jaccard >= minEstJac, as (idCol, corpus_id,
    * est_jaccard). Hash parameters come from the index's meta. */
  def probe(newDocs: DataFrame, idCol: String, textCol: String,
      path: String, minEstJac: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    val (n, k, bands, seed) = meta(spark, path)
    // NO cache: the signature subplan feeds both the banded candidate join
    // and the __sa rejoin, but it is a row-local codegen map over the BATCH
    // (the small side by contract) — recomputing it once costs microseconds
    // per row, where a .cache() here would grow executor storage unboundedly
    // in a long-running foreachBatch ingest loop unless every caller
    // remembered to clear it. Leaving nothing cached makes probe safe to
    // call forever.
    val sigs = Dedup.minhashSignatures(newDocs, idCol, textCol, n, k, seed)
      .select(col(idCol).as("__bid"), col("sig"))
    val cands = banded(sigs, "__bid", k, bands)
      .withColumnRenamed("id", "__bid")
      .join(spark.read.parquet(s"$path/bands"), Seq("band_idx", "band_hash"))
      .select(col("__bid"), col("id").as("corpus_id"))
      .distinct()
    cands
      .join(sigs.select(col("__bid"), col("sig").as("__sa")), "__bid")
      .join(spark.read.parquet(s"$path/sigs")
        .select(col("id").as("corpus_id"), col("sig").as("__sb")), "corpus_id")
      // codegen estimator kernel — the interpreted aggregate(zip_with(...))
      // form pays lambda dispatch per signature position per candidate pair
      .withColumn("est_jaccard",
        graft.functions.expressions.SketchExpressions.sig_agreement(
          col("__sa"), col("__sb")))
      .filter(col("est_jaccard") >= minEstJac)
      .select(col("__bid").as(idCol), col("corpus_id"),
        round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** The curation form: the batch minus everything that near-duplicates
    * the indexed corpus (docs too short to shingle pass through — they
    * cannot match). */
  def dropSeenNearDups(newDocs: DataFrame, idCol: String, textCol: String,
      path: String, minEstJac: Double = 0.5): DataFrame =
    newDocs.join(
      probe(newDocs, idCol, textCol, path, minEstJac)
        .select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
