package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()

  test("every document lands in exactly one chunk; totals respect the cap") {
    val chunks = Packing.packDocuments(docs, "doc_id", "text",
      maxTokens = 512, bucketHexChars = 1).cache()
    val allIds = docs.select($"doc_id").as[Long].collect().toSet
    val packedIds = chunks.flatMap(_.doc_ids).collect()
    assert(packedIds.length === allIds.size, "no doc duplicated")
    assert(packedIds.toSet === allIds, "no doc dropped")
    // every multi-doc chunk respects the cap (single docs always admit)
    chunks.collect().foreach { c =>
      assert(c.n_docs === c.doc_ids.size)
      if (c.n_docs > 1) assert(c.total_tokens <= 512, s"chunk ${c.chunk_id} overflows")
    }
    // totals are consistent with the corpus
    val corpusTokens = docs
      .select(sum(size(split($"text", " ")))).as[Long].head()
    assert(chunks.map(_.total_tokens).collect().sum === corpusTokens)
  }

  test("packing is deterministic and independent of input partitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.packDocuments(d, "doc_id", "text", maxTokens = 512, bucketHexChars = 1)
        .collect().map(c => c.chunk_id -> ((c.doc_ids, c.total_tokens))).toMap
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(13, $"lang"))
    assert(a === b)
  }

  test("greedy fill: chunks are substantially full when docs are small vs cap") {
    val chunks = Packing.packDocuments(docs, "doc_id", "text",
      maxTokens = 2048, bucketHexChars = 1).collect()
    val fill = chunks.map(_.total_tokens).sum.toDouble / (chunks.length * 2048L)
    assert(fill >= 0.5, s"average fill $fill")
  }

  test("an oversized document gets its own chunk instead of stalling the stream") {
    val big = Seq(
      (1L, Seq.fill(100)("w").mkString(" ")), // 100 tokens > cap
      (2L, "a b c"),
      (3L, "d e f")).toDF("doc_id", "text")
    val chunks = Packing.packDocuments(big, "doc_id", "text",
      maxTokens = 10, bucketHexChars = 1).collect()
    val byDoc = chunks.flatMap(c => c.doc_ids.map(_ -> c)).toMap
    assert(byDoc(1L).n_docs === 1, "oversized doc isolated")
    assert(byDoc(1L).total_tokens === 100)
    assert(chunks.flatMap(_.doc_ids).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("packs by REAL BPE token counts when composed with Bpe.tokenCount") {
    val sub = docs.limit(80)
    val model = graft.functions.Bpe.fit(sub, "text", nMerges = 100, maxWords = 5000)
    val counted = model.tokenCount(sub, "text")
    val chunks = Packing.packGreedy(counted, "doc_id", "bpe_tokens",
      maxTokens = 256, bucketHexChars = 1).collect()
    val perDoc = counted.select($"doc_id", $"bpe_tokens")
      .as[(Long, Int)].collect().toMap
    assert(chunks.flatMap(_.doc_ids).length === 80)
    chunks.foreach { c =>
      assert(c.total_tokens === c.doc_ids.map(perDoc(_).toLong).sum,
        "chunk totals are the BPE counts, not whitespace counts")
      if (c.n_docs > 1) assert(c.total_tokens <= 256)
    }
  }

  test("chunk ids name their md5 bucket; salt draws an independent packing") {
    val chunks = Packing.packDocuments(docs, "doc_id", "text",
      maxTokens = 512, bucketHexChars = 2).collect()
    assert(chunks.forall(_.chunk_id.matches("[0-9a-f]{2}-\\d+")))
    val other = Packing.packDocuments(docs, "doc_id", "text",
      maxTokens = 512, bucketHexChars = 2, salt = "pack2:").collect()
    val a = chunks.map(c => c.chunk_id -> c.doc_ids).toMap
    val b = other.map(c => c.chunk_id -> c.doc_ids).toMap
    assert(a !== b, "different salts must draw different assignments")
  }
}
