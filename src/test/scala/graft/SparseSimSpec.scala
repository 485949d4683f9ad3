package graft

import org.apache.spark.sql.functions._

import graft.operators.{SparseSim, TfIdf}

/** SparseSim: exact sparse tf-idf cosine all-pairs with the Bayardo
  * one-sided prefix filter — equality with the naive shared-dim plan,
  * hand-checked integer witnesses, and the pruning claim itself. */
class SparseSimSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDocs = graft.core.Tables.documents(spark, sfDir)

  test("prefix-filtered == naive shared-dim plan across thresholds on the fixture") {
    val docs = fixtureDocs
    val vocab = TfIdf.fitVocab(docs, "doc_id", "text", vocabSize = 200)
    for (t <- Seq(70, 85, 95)) {
      val fast = SparseSim.cosinePairs(docs, "doc_id", "text", vocab, t)
        .orderBy("id_a", "id_b").collect().toSeq
      val naive = SparseSim.cosinePairsNaive(docs, "doc_id", "text", vocab, t)
        .orderBy("id_a", "id_b").collect().toSeq
      assert(fast === naive, s"prefix filter lost or invented pairs at t=$t")
    }
  }

  test("identical documents meet threshold 100 with dot == na2 == nb2") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha beta beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val vocab = TfIdf.fitVocab(docs, "doc_id", "text", vocabSize = 50)
    val rows = SparseSim.cosinePairs(docs, "doc_id", "text", vocab, minCosCenti = 100)
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getLong(2) === r.getLong(3) && r.getLong(3) === r.getLong(4),
      "cos = 1 pair must have dot == na2 == nb2 exactly")
  }

  test("hot shared dim prunes to zero candidates while naive pairs explode") {
    // every doc repeats the stopword `hot`; each carries one unique rare
    // term of comparable weight, so cos ~ 0.5 for all pairs — the hot dim
    // alone can't reach t = 0.8, and the energy cut drops it from every
    // prefix. The naive plan still materializes all C(40,2) pairs.
    val docs = (1L to 40L).map(i => (i, s"hot hot hot hot u$i")).toDF("doc_id", "text")
    val vocab = TfIdf.fitVocab(docs, "doc_id", "text", vocabSize = 64)
    val cands = SparseSim.candidatePairs(docs, "doc_id", "text", vocab,
      minCosCenti = 80, quant = 100)
    assert(cands.pairs.count() === 0L,
      "prefix filter must drop the stopword-only candidate groups")
    val naive = SparseSim.cosinePairsNaive(docs, "doc_id", "text", vocab, 80)
    assert(naive.count() === 0L, "no pair actually qualifies at t=0.8")
    val fast = SparseSim.cosinePairs(docs, "doc_id", "text", vocab, 80)
    assert(fast.count() === 0L)
  }

  test("qualifying rare-term pair survives the prefix filter") {
    val docs = (
      Seq((1L, "rare rare rare rare common"), (2L, "rare rare rare rare common")) ++
      (3L to 30L).map(i => (i, s"common common filler$i"))).toDF("doc_id", "text")
    val vocab = TfIdf.fitVocab(docs, "doc_id", "text", vocabSize = 64)
    val rows = SparseSim.cosinePairs(docs, "doc_id", "text", vocab, minCosCenti = 95)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("exact decision agrees with float cosine away from the boundary") {
    // completeness + soundness against an independent DOUBLE tf-idf cosine
    // over the unquantized weights: every returned pair sits >= t - margin,
    // every pair clearly above t (+ margin for quantization) is returned
    val docs = fixtureDocs
    val vocab = TfIdf.fitVocab(docs, "doc_id", "text", vocabSize = 200)
    val t = 0.85
    val got = SparseSim.cosinePairs(docs, "doc_id", "text", vocab, minCosCenti = 85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = docs
      .select($"doc_id".as("sid"), explode(graft.functions.TextFunctions.tokens($"text")).as("term"))
      .groupBy("sid", "term").agg(count(lit(1)).as("tf"))
      .join(broadcast(vocab.select($"term", $"idx", $"idf")), "term")
      .select($"sid", $"idx", ($"tf" * $"idf").as("w"))
    val norms = w.groupBy("sid").agg(sum($"w" * $"w").as("n2"))
    val floatCos = w.select($"sid".as("id_a"), $"idx", $"w".as("wa"))
      .join(w.select($"sid".as("id_b"), $"idx", $"w".as("wb")), "idx")
      .filter($"id_a" < $"id_b")
      .groupBy("id_a", "id_b").agg(sum($"wa" * $"wb").as("dot"))
      .join(norms.select($"sid".as("id_a"), $"n2".as("na2")), "id_a")
      .join(norms.select($"sid".as("id_b"), $"n2".as("nb2")), "id_b")
      .select($"id_a", $"id_b", ($"dot" / sqrt($"na2" * $"nb2")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val margin = 0.05
    got.foreach { p =>
      assert(floatCos(p) >= t - margin, s"returned pair $p has float cos ${floatCos(p)}")
    }
    floatCos.foreach { case (p, c) =>
      if (c >= t + margin)
        assert(got.contains(p), s"pair $p with float cos $c clearly above t is missing")
    }
    assert(floatCos.values.exists(_ >= t + margin),
      "fixture must exercise the completeness direction")
  }

  test("shingle-term path (the q113 shape): prefix == naive over the FromTerms seam") {
    val docs = fixtureDocs
    val ws = graft.functions.TextFunctions.tokens($"text")
    val shingleTerms = when(size(ws) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - 3),
        i => array_join(slice(ws, i + 1, lit(3)), " ")))
    val terms = docs.select($"doc_id".as("sid"), explode(shingleTerms).as("term"))
    val vocab = TfIdf.fitVocabFromTerms(terms.withColumnRenamed("sid", "__id"),
      docs.count(), vocabSize = 500)
    val fast = SparseSim.cosinePairsFromTerms(terms, vocab, 85)
      .orderBy("id_a", "id_b").collect().toSeq
    val naive = SparseSim.cosinePairsNaiveFromTerms(terms, vocab, 85)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(fast === naive)
    assert(fast.nonEmpty, "fixture near-dups must surface as shingle-cosine pairs")
  }

  test("partition-count invariance") {
    val docs = fixtureDocs
    val vocab = TfIdf.fitVocab(docs, "doc_id", "text", vocabSize = 200)
    val base = SparseSim.cosinePairs(docs, "doc_id", "text", vocab, 85)
      .orderBy("id_a", "id_b").collect().toSeq
    val reparted = SparseSim.cosinePairs(docs.repartition(13), "doc_id", "text", vocab, 85)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(base === reparted)
  }

  test("threshold parameter is validated") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val vocab = TfIdf.fitVocab(docs, "doc_id", "text", vocabSize = 4)
    intercept[IllegalArgumentException] {
      SparseSim.cosinePairs(docs, "doc_id", "text", vocab, minCosCenti = 0)
    }
    intercept[IllegalArgumentException] {
      SparseSim.cosinePairs(docs, "doc_id", "text", vocab, minCosCenti = 101)
    }
  }
}
