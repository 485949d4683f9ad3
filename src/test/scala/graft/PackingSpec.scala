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
  test("chunkTokens: brute-force equality, coverage, and containment rules") {
    import org.apache.spark.sql.functions.col
    // adversarial lengths around the window: empty-ish, < chunk, == chunk,
    // == chunk+1 (forces a 1-token-extension window), long
    val fixture = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 8).map(i => s"s$i").mkString(" ")),
      (3L, (1 to 9).map(i => s"u$i").mkString(" ")),
      (4L, (1 to 17).map(i => s"v$i").mkString(" ")),
      (5L, "solo"),
      (6L, ""))
    def brute(docs: Seq[(Long, String)], c: Int, s: Int): Set[(Long, Long, Long, Long, String)] =
      docs.flatMap { case (id, t) =>
        val ts = t.split(" ", -1)
        val starts = Iterator.from(1, s).takeWhile(_ <= ts.length)
          .toList.takeWhile(st => st == 1 || st - s + c - 1 < ts.length)
        starts.zipWithIndex.map { case (st, i) =>
          (id, (i + 1).toLong, st.toLong,
            math.min(c, ts.length - st + 1).toLong,
            ts.slice(st - 1, st - 1 + c).mkString(" "))
        }
      }.toSet
    for ((c, s) <- Seq((8, 8), (8, 6), (8, 1), (1, 1))) {
      val got = Packing.chunkTokens(fixture.toDF("doc_id", "text"),
          "doc_id", "text", chunkSize = c, stride = s)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(got === brute(fixture, c, s), s"c=$c s=$s")
    }
    // tiling (stride == chunk): concatenating a doc's chunks rebuilds it
    val tiled = Packing.chunkTokens(fixture.toDF("doc_id", "text"),
        "doc_id", "text", chunkSize = 8, stride = 8)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .as[(Long, Long, Long, Long, String)].collect()
    for ((id, text) <- fixture) {
      assert(tiled.filter(_._1 == id).map(_._5).mkString(" ") === text, s"doc $id")
    }
    // chunking is a pure map: no exchange in the plan
    val plan = Packing.chunkTokens(fixture.toDF("doc_id", "text"),
      "doc_id", "text", 8, 6).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
  }
  test("chunkTokens: null text yields one empty chunk instead of vanishing") {
    val withNull = Seq((1L, "a b c"), (2L, null: String)).toDF("doc_id", "text")
    val out = Packing.chunkTokens(withNull, "doc_id", "text", 8, 8)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSet === Set(1L, 2L))
    val nullRow = out.find(_._1 == 2L).get
    assert(nullRow._5 === "" && nullRow._2 === 1L)
  }
}
