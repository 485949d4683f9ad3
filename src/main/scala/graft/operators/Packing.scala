package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing for LLM training: group documents into chunks whose
  * token totals stay within the training context length, so batches waste
  * as little padding as possible.
  *
  * Algorithm: greedy first-fit over a deterministic pseudo-random document
  * order. Not bin-packing-optimal — optimal packing is a global problem
  * that cannot stream — but greedy over a shuffled order is the standard
  * corpus-scale choice and fills chunks to ~maxTokens whenever documents
  * are small relative to the context.
  *
  * Portability: both the order key and the bucket come from
  * md5(salt ++ id) — the same engine-portable scheme as [[Sampling]] — so
  * the exact chunk assignment is reproducible in any engine with md5 (the
  * q49 oracle recomputes it in DuckDB via a recursive CTE and the results
  * hash-match).
  *
  * Scale shape: the ONLY thing shuffled is (doc_id, n_tokens, bucket, h) —
  * tens of bytes per document, never the text. Documents are bucketed by
  * an md5 hex prefix (16^bucketHexChars buckets), one exchange routes each
  * bucket to a partition, and packing streams through each bucket's
  * hash-sorted run holding ONE open chunk in memory. Chunk ids are
  * "<bucket>-<index-in-bucket>": deterministic for a given corpus, salt,
  * and bucketHexChars, independent of the input's partitioning. Size
  * bucketHexChars so a bucket's (id, count) stream fits a task comfortably
  * (~10M docs per bucket is fine; 16^4 = 65536 buckets covers ~1e12 docs).
  * The text gather is a later id-join against the corpus — chunks carry
  * doc ids, not payloads.
  *
  * A single document larger than maxTokens gets its own chunk (the first
  * document of a chunk is always admitted); split oversized documents
  * upstream if that is not acceptable.
  */
object Packing {

  final case class PackedChunk(chunk_id: String, doc_ids: Seq[Long],
      n_docs: Int, total_tokens: Long)

  /** Pack by a precomputed token-count column. */
  def packGreedy(docs: DataFrame, idCol: String, nTokensCol: String,
      maxTokens: Int, bucketHexChars: Int = 2,
      salt: String = "pack:"): Dataset[PackedChunk] = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(bucketHexChars >= 1 && bucketHexChars <= 4,
      s"bucketHexChars must be in [1, 4], got $bucketHexChars")
    val spark = docs.sparkSession
    import spark.implicits._
    val nPartitions = math.min(math.pow(16, bucketHexChars).toInt, 4096)
    docs
      .select(col(idCol).cast("long").as("id"),
        col(nTokensCol).cast("long").as("n"),
        md5(concat(lit(salt), col(idCol).cast("long").cast("string"))).as("h"))
      .withColumn("bucket", substring(col("h"), 1, bucketHexChars))
      .repartition(nPartitions, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("h"), col("id"))
      .select(col("id"), col("n"), col("bucket"))
      .as[(Long, Long, String)]
      .mapPartitions { rows =>
        val buf = rows.buffered
        new Iterator[PackedChunk] {
          private var bucket: String = null
          private var idx = -1L
          override def hasNext: Boolean = buf.hasNext
          override def next(): PackedChunk = {
            val (id0, n0, b0) = buf.next()
            if (b0 != bucket) { bucket = b0; idx = -1L }
            idx += 1
            val ids = scala.collection.mutable.ArrayBuffer(id0)
            var toks = math.max(n0, 0L)
            var open = true
            while (open && buf.hasNext) {
              val (id, n, b) = buf.head
              if (b != bucket || toks + math.max(n, 0L) > maxTokens) open = false
              else { buf.next(); ids += id; toks += math.max(n, 0L) }
            }
            PackedChunk(s"$bucket-$idx", ids.toSeq, ids.size, toks)
          }
        }
      }
  }

  /** Fixed-size token windows with stride — the context-window chunking
    * that feeds an LLM tokenizer/packer (stride < chunkSize gives the
    * standard overlapping windows; stride == chunkSize tiles the document
    * exactly). Start positions advance by `stride` from 1; generation
    * stops once a window reaches the document's end (a window is emitted
    * only if it is the first or extends coverage past the previous one, so
    * no emitted window is wholly contained in its predecessor). The final
    * window may be shorter than chunkSize — padding is the trainer's
    * concern, not the chunker's.
    *
    * Entirely row-local (one explode, no shuffle): (idCol, chunk_idx,
    * start_pos, n_tokens, chunk) with 1-based token positions. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    // null text reads as empty: the doc still yields its one (empty) chunk
    // instead of vanishing from the output
    docs.select(col(idCol).as("__id"),
        split(coalesce(col(textCol), lit("")), " ").as("__ts"))
      .select(col("__id"), explode(expr(
        s"""transform(
           |  filter(sequence(1, size(__ts), $stride),
           |    st -> st = 1 OR st - $stride + $chunkSize - 1 < size(__ts)),
           |  (st, i) -> named_struct(
           |    'chunk_idx', cast(i + 1 as bigint),
           |    'start_pos', cast(st as bigint),
           |    'n_tokens', cast(least($chunkSize, size(__ts) - st + 1) as bigint),
           |    'chunk', concat_ws(' ', slice(__ts, st, $chunkSize))))"""
          .stripMargin)).as("c"))
      .select(col("__id").as(idCol), col("c.chunk_idx").as("chunk_idx"),
        col("c.start_pos").as("start_pos"), col("c.n_tokens").as("n_tokens"),
        col("c.chunk").as("chunk"))
  }

  /** Convenience: pack raw text documents, counting tokens inline. */
  def packDocuments(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, bucketHexChars: Int = 2,
      salt: String = "pack:"): Dataset[PackedChunk] =
    packGreedy(
      docs.withColumn("__n_tokens", TextFunctions.tokenCount(col(textCol))),
      idCol, "__n_tokens", maxTokens, bucketHexChars, salt)
}
