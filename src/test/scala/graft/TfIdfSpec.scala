package graft

import graft.core.Tables
import graft.operators.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val tiny = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple date")).toDF("doc_id", "text")

  test("vocab: df counts, (df desc, term asc) order, smooth idf") {
    val vocab = TfIdf.fitVocab(tiny, "doc_id", "text", vocabSize = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap
    // apple in docs 1,3; banana in 1,2; cherry in 2; date in 3
    assert(vocab("apple")._1 === 0 && vocab("apple")._2 === 2L)
    assert(vocab("banana")._1 === 1 && vocab("banana")._2 === 2L)
    assert(vocab("cherry")._1 === 2 && vocab("cherry")._2 === 1L)
    assert(vocab("date")._1 === 3 && vocab("date")._2 === 1L)
    val idf2 = math.log(4.0 / 3.0) + 1.0 // df = 2, N = 3
    assert(math.abs(vocab("apple")._3 - idf2) < 1e-12)
  }

  test("vocab cap keeps the top-V by df with term tiebreak") {
    val vocab = TfIdf.fitVocab(tiny, "doc_id", "text", vocabSize = 2)
      .collect().map(_.getString(0)).toSeq
    assert(vocab === Seq("apple", "banana"))
  }

  test("vectorize: hand-computed tf*idf weights, sorted indices, OOV drops") {
    val vocab = TfIdf.fitVocab(tiny, "doc_id", "text", vocabSize = 2) // apple, banana
    val vecs = TfIdf.vectorize(tiny, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getSeq[Double](2), r.getInt(3)))).toMap
    val idf = math.log(4.0 / 3.0) + 1.0
    // doc 1: apple tf=2, banana tf=1
    assert(vecs(1L)._1 === Seq(0, 1))
    assert(vecs(1L)._2.zip(Seq(2 * idf, 1 * idf)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // doc 2: banana only (cherry OOV at V=2)
    assert(vecs(2L)._1 === Seq(1) && vecs(2L)._3 === 1)
    // doc 3: apple only (date OOV)
    assert(vecs(3L)._1 === Seq(0))
  }

  test("documents with no in-vocab terms keep an empty-vector row") {
    val vocab = TfIdf.fitVocab(tiny, "doc_id", "text", vocabSize = 10)
    val withAlien = tiny.union(Seq((9L, "zzz qqq")).toDF("doc_id", "text"))
    val vecs = TfIdf.vectorize(withAlien, "doc_id", "text", vocab)
    assert(vecs.count() === 4)
    val alien = vecs.filter($"doc_id" === 9L).head()
    assert(alien.getSeq[Int](1).isEmpty && alien.getInt(3) === 0)
  }

  test("fixture corpus: deterministic across runs, indices always sorted") {
    val docs = Tables.documents(spark, sfDir).limit(100).cache()
    val vocab = TfIdf.fitVocab(docs, "doc_id", "text", vocabSize = 500).cache()
    val v1 = TfIdf.vectorize(docs, "doc_id", "text", vocab).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getSeq[Double](2)))).toMap
    val v2 = TfIdf.vectorize(docs.repartition(7), "doc_id", "text", vocab).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getSeq[Double](2)))).toMap
    assert(v1 === v2)
    v1.values.foreach { case (idx, w) =>
      assert(idx === idx.sorted)
      assert(idx.length === w.length)
    }
  }
}
