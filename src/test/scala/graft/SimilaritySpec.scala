package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("cosine similarity of a vector with itself is 1") {
    val sims = emb.limit(10)
      .select(Similarity.cosine($"embedding", $"embedding").as("s"))
      .as[Double].collect()
    sims.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("mismatched vector dimensions error instead of silently truncating") {
    // matches the oracle: DuckDB's list_cosine_similarity raises too
    val pairs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      pairs.select(Similarity.cosine($"a", $"b")).collect()
    }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(e).getMessage.contains("dimension mismatch"), e.getMessage)
  }

  test("lsh_buckets rejects degenerate table/plane counts") {
    import graft.functions.expressions.SketchExpressions.lsh_buckets
    for ((tables, planes) <- Seq((0, 8), (4, 0), (4, 64))) {
      intercept[IllegalArgumentException] {
        emb.limit(1).select(lsh_buckets($"embedding", tables, planes)).collect()
      }
    }
  }

  test("lshNearDupPairs: subset of brute-force pairs, strong pairs recalled") {
    val sub = emb.filter($"vec_id" < 200).cache()
    val brute = sub.as("x").join(sub.as("y"), $"x.vec_id" < $"y.vec_id")
      .withColumn("sim", round(Similarity.cosine($"x.embedding", $"y.embedding"), 6))
      .filter($"sim" >= 0.4)
      .select($"x.vec_id", $"y.vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(sub, "vec_id", "embedding",
        minSim = 0.4, nPlanes = 4, nTables = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // exact verification: never a false accept
    assert((lsh diff brute).isEmpty)
    val recall = if (brute.isEmpty) 1.0 else (lsh intersect brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"lsh near-dup recall $recall of ${brute.size} pairs")
  }

  test("brute-force top-k returns k ranked neighbors per query") {
    val res = Similarity.cosineTopK(
      emb.filter($"vec_id" < 5), emb, "vec_id", "embedding", k = 3)
    val rows = res.collect()
    assert(rows.length === 15)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sims = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.sameElements(sims.sorted.reverse), "sims non-increasing by rank")
    }
  }

  test("LSH top-k achieves >= 60% recall@5 vs brute force") {
    val queries = emb.filter($"vec_id" < 20)
    val exact = Similarity.cosineTopK(queries, emb, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshCosineTopK(queries, emb, "vec_id", "embedding",
        k = 5, nPlanes = 4, nTables = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall@5 = $recall")
  }

  test("near-dup pairs are symmetric-free (id_a < id_b) and above threshold") {
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", "label", 0.3)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("hardNegatives: k ranked different-label neighbors, ≡ driver brute force") {
    val subset = emb.filter($"vec_id" < 80).cache()
    val queries = subset.filter($"vec_id" < 4)
    val got = Similarity.hardNegatives(
        subset.filter($"vec_id" < 4), subset, "vec_id", "embedding", "label", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    val all = subset.select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
    val labelOf = all.map(a => a._1 -> a._3).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      val raw = dot / (math.sqrt(na) * math.sqrt(nb))
      new java.math.BigDecimal(java.lang.Double.toString(raw))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val expected = all.filter(_._1 < 4).flatMap { case (qid, qv, ql) =>
      all.filter(c => c._1 != qid && c._3 != ql)
        .map(c => (c._1, c._3, cos(qv, c._2)))
        .sortBy { case (nid, _, s) => (-s, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, nl, s), i) => (qid, (i + 1).toLong, nid, nl, s) }
    }.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)).toSeq === expected.toSeq)
    // every mined negative really has a different label than its query
    got.foreach { case (qid, _, nid, nl, _) =>
      assert(nl !== labelOf(qid))
      assert(labelOf(nid) === nl)
    }
  }

  test("MMR: lambda=1 reduces to plain top-k; lambda=0.5 breaks up a redundant cluster") {
    // query at the origin direction; cluster A = 5 near-copies very close
    // to the query, cluster B = 3 vectors on a different axis but still
    // positively similar
    def v(xs: Double*): Seq[Double] = xs
    val corpus = Seq(
      (10L, v(1.0, 0.01, 0.0)), (11L, v(1.0, 0.02, 0.0)),
      (12L, v(1.0, 0.03, 0.0)), (13L, v(1.0, 0.04, 0.0)),
      (14L, v(1.0, 0.05, 0.0)),
      (20L, v(0.5, 0.0, 0.9)), (21L, v(0.5, 0.0, 0.95)),
      (22L, v(0.5, 0.0, 1.0))).toDF("vec_id", "embedding")
    val query = Seq((1L, v(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val plain = Similarity.cosineTopK(query, corpus, "vec_id", "embedding", 4)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect().toSeq
    val mmr1 = Similarity.mmrTopK(query, corpus, "vec_id", "embedding",
        k = 4, poolSize = 8, lambda = 1.0)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(mmr1 === plain, "lambda = 1 must reproduce the plain ranking")
    assert(plain.forall(id => id >= 10L && id <= 14L),
      "plain top-4 is all redundant cluster A")
    val mmr5 = Similarity.mmrTopK(query, corpus, "vec_id", "embedding",
        k = 4, poolSize = 8, lambda = 0.5)
      .orderBy($"rank").select($"id").as[Long].collect().toSeq
    assert(mmr5.exists(_ >= 20L),
      s"diversified selection must reach cluster B: $mmr5")
    assert(mmr5.head === plain.head, "the first pick is always the most relevant")
    // k beyond the pool: emits everything once, never loops
    val all = Similarity.mmrTopK(query, corpus, "vec_id", "embedding",
        k = 8, poolSize = 8, lambda = 0.3)
      .select($"id").as[Long].collect()
    assert(all.length === 8 && all.toSet.size === 8)
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(query, corpus, "vec_id", "embedding", 5, 4, 0.5)
    }
    // a string/UUID id would silently cast to null and collapse every
    // query into one null group — rejected up front
    val strIds = corpus.withColumn("vec_id", $"vec_id".cast("string"))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrTopK(query.withColumn("vec_id", $"vec_id".cast("string")),
        strIds, "vec_id", "embedding", 2, 4, 0.5)
    }
    assert(e.getMessage.contains("integral"))
  }
}
