package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing for LLM training: group documents into chunks whose
  * token totals stay within the training context length, so batches waste
  * as little padding as possible.
  *
  * Algorithm: greedy first-fit over a deterministic pseudo-random document
  * order (xxhash64). Not bin-packing-optimal — optimal packing is a global
  * problem that cannot stream — but greedy over a shuffled order is the
  * standard corpus-scale choice and fills chunks to ~maxTokens whenever
  * documents are small relative to the context.
  *
  * Scale shape: the ONLY thing shuffled is (doc_id, n_tokens, bucket) —
  * ~20 bytes per document, never the text. Documents are hash-bucketed
  * (`nBuckets` fixed), one exchange routes each bucket to one partition,
  * and packing streams through each bucket's hash-sorted run holding ONE
  * open chunk in memory. Chunk ids are (bucket << 32 | index-in-bucket):
  * deterministic for a given corpus and nBuckets, independent of the
  * input's partitioning. The text gather is a later id-join against the
  * corpus (chunks carry doc ids, not payloads).
  *
  * A single document larger than maxTokens gets its own chunk (the first
  * document of a chunk is always admitted); split oversized documents
  * upstream if that is not acceptable.
  */
object Packing {

  final case class PackedChunk(chunk_id: Long, doc_ids: Seq[Long],
      n_docs: Int, total_tokens: Long)

  /** Pack by a precomputed token-count column. */
  def packGreedy(docs: DataFrame, idCol: String, nTokensCol: String,
      maxTokens: Int, nBuckets: Int = 256): Dataset[PackedChunk] = {
    require(maxTokens >= 1 && nBuckets >= 1,
      s"need maxTokens >= 1 (got $maxTokens) and nBuckets >= 1 (got $nBuckets)")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        col(nTokensCol).cast("long").as("n"))
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(nBuckets)).cast("int"))
      .withColumn("h", xxhash64(col("id"), lit("pack")))
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("h"), col("id"))
      .select(col("id"), col("n"), col("bucket"))
      .as[(Long, Long, Int)]
      .mapPartitions { rows =>
        val buf = rows.buffered
        new Iterator[PackedChunk] {
          private var bucket = Int.MinValue
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
            PackedChunk((bucket.toLong << 32) | idx, ids.toSeq, ids.size, toks)
          }
        }
      }
  }

  /** Convenience: pack raw text documents, counting tokens inline. */
  def packDocuments(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, nBuckets: Int = 256): Dataset[PackedChunk] =
    packGreedy(
      docs.withColumn("__n_tokens", TextFunctions.tokenCount(col(textCol))),
      idCol, "__n_tokens", maxTokens, nBuckets)
}
