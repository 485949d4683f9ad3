package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.expressions.VectorExpressions.cosine_sim
import graft.functions.expressions.SketchExpressions.lsh_buckets

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, per the standard ANN trade-off:
  *  - [[cosineTopK]]: brute-force exact top-k. One broadcast of the query
  *    set, one scan of the candidates — correct baseline, and actually the
  *    right plan whenever |queries| is small (the scan is the cost floor).
  *  - [[lshCosineTopK]]: random-hyperplane LSH. Each vector gets a sign
  *    bucket; join on bucket. Sub-linear candidates at the cost of recall —
  *    the 100 TB path when |queries| is large.
  *
  * All arithmetic is a sequential left-fold over the array in index order
  * (`aggregate`), in double precision — deterministic, and bit-identical to
  * the DuckDB oracle's list_cosine_similarity.
  */
object Similarity {

  /** Sequential-fold dot product (composable reference implementation; the
    * hot paths use the codegen expressions in VectorExpressions). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** L2 norm via the same fold. */
  def l2norm(a: Column): Column = sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _))

  /** Cosine similarity of two float-array columns (double internally).
    * Backed by the codegen CosineSim expression — same sequential-fold
    * arithmetic as the composable form, ~10x faster per pair. */
  def cosine(a: Column, b: Column): Column = cosine_sim(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    *
    * Norms are computed once per side before the join (not per pair), the
    * query side is broadcast, and ranking uses the similarity rounded to 6
    * decimals with the candidate id as tie-break — deterministic across
    * engines and runs.
    *
    * Output: (query_id, rank, neighbor_id, sim). */
  /** Hard-negative mining for contrastive training: per query, the top-k
    * MOST similar candidates with a DIFFERENT label — the "looks alike,
    * isn't" pairs an embedding/retrieval model trains against. Same plan
    * as [[cosineTopK]] (broadcast query side, codegen cosine, per-query
    * window over the rounded sim) with the label-mismatch predicate
    * applied BEFORE ranking, so k true negatives always come out, not
    * k-minus-however-many-positives-ranked-higher. At corpus scale swap
    * the brute-force candidate side for [[lshCosineTopK]]'s bucketed
    * candidates the same way q30 does for q28. */
  def hardNegatives(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("__ql"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("__cl"))
    val paired = broadcast(q).join(c,
        col("query_id") =!= col("neighbor_id") &&
          !(col("__ql") <=> col("__cl")))
      .withColumn("sim", round(cosine_sim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    paired.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("__cl").as("neighbor_label"), col("sim"))
  }

  def cosineTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val paired = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine_sim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    paired.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * (multi-probe over `nTables` independent bucket sets for recall).
    * Same output shape as [[cosineTopK]].
    *
    * Shuffle discipline: the bucket join and the candidate-dedup distinct
    * move ONLY ids — a vector that collides with a query in several tables
    * must be scored once, and deduplicating (query_id, neighbor_id) pairs
    * keyed on the 16-byte id pair costs a fraction of hashing the embedding
    * arrays as grouping keys. Vectors are re-attached afterwards: the query
    * side by broadcast (queries are small by contract), the candidate side
    * by one id-keyed join that AQE broadcasts whenever the surviving pair
    * set is small. */
  def lshCosineTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    def bucketed(df: DataFrame, id: String, vec: String) =
      df.select(col(id),
        posexplode(lsh_buckets(col(vec), nTables, nPlanes)).as(Seq("tbl", "bucket")))
    val cands = bucketed(q, "query_id", "qv")
      .join(bucketed(c, "neighbor_id", "cv"), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val paired = cands
      .join(broadcast(q), "query_id")
      .join(c, "neighbor_id")
      .withColumn("sim", round(cosine_sim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    paired.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Near-duplicate pairs with NO caller-provided block key: candidates
    * come from random-hyperplane LSH bucket collisions (multi-probe over
    * nTables), then exact cosine verification keeps pairs >= minSim.
    * Approximate — a pair the planes separate in every table is missed —
    * where [[nearDupPairs]] with a semantic key is exact within blocks; no
    * false accepts either way (verification is exact). Same shuffle
    * discipline as [[lshCosineTopK]]: bucket join and dedup move ids only,
    * vectors rejoin once by id. */
  def lshNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      minSim: Double, nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    val v = vectors.select(col(idCol).as("vid"), col(vecCol).as("v"))
    val bucketed = v.select(col("vid"),
      posexplode(lsh_buckets(col("v"), nTables, nPlanes)).as(Seq("tbl", "bucket")))
    val cands = bucketed.as("x").join(bucketed.as("y"), Seq("tbl", "bucket"))
      .filter(col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("id_a"), col("y.vid").as("id_b"))
      .distinct()
    cands
      .join(v.select(col("vid").as("id_a"), col("v").as("va")), "id_a")
      .join(v.select(col("vid").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("sim", round(cosine_sim(col("va"), col("vb")), 6))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Near-duplicate pairs by cosine >= minSim, blocked on a coarse key to
    * avoid the all-pairs cross join (callers pass a clustering column like a
    * label, an LSH bucket, or a shard key). */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      blockCol: String, minSim: Double): DataFrame = {
    val v = vectors.select(col(blockCol).as("blk"), col(idCol).as("vid"),
        col(vecCol).as("v"))
    v.as("x").join(v.as("y"),
        col("x.blk") === col("y.blk") && col("x.vid") < col("y.vid"))
      .withColumn("sim", round(cosine_sim(col("x.v"), col("y.v")), 6))
      .filter(col("sim") >= minSim)
      .select(col("x.vid").as("id_a"), col("y.vid").as("id_b"), col("sim"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
    * public): pick k results that are RELEVANT to the query but not
    * redundant with each other — the diversified-retrieval /
    * diverse-exemplar-selection step downstream of any top-k:
    *
    *   next = argmax_{d ∉ S} [ λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s) ]
    *
    * Two-stage shape: [[cosineTopK]] fetches each query's `poolSize`
    * exact candidates (λ = 1 reduces MMR to that ranking — the spec's
    * limit identity), then a `groupByKey(query).mapGroups` runs the
    * greedy selection ROW-LOCALLY per query — the pool is
    * parameter-bounded (≤ poolSize vectors), so the pairwise cosines
    * and the k greedy passes are O(poolSize²·dim) per query inside one
    * task, never a driver loop and never a corpus-wide pairwise join.
    * Ties break by candidate id; scores round to 6 decimals first so a
    * float wobble can't flip the argmax (the house rank discipline).
    * Output: (query_id, rank, id, mmr_score). */
  def mmrTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, poolSize: Int, lambda: Double): DataFrame = {
    require(k >= 1 && poolSize >= k,
      s"need poolSize ($poolSize) >= k ($k) >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda $lambda outside [0, 1]")
    // the row-local greedy keys on LONG ids through a typed Dataset; a
    // string/UUID id would silently cast to null and collapse every query
    // into one null group — reject it loudly (cosineTopK itself is
    // id-type-agnostic, so callers with non-integral ids can rank there
    // and map ids through a dictionary first)
    Seq("queries" -> queries, "candidates" -> candidates).foreach { case (side, df) =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val ok = df.schema(idCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"mmrTopK requires an integral $idCol on the $side side, " +
        s"got ${df.schema(idCol).dataType.simpleString}")
    }
    val spark = queries.sparkSession
    import spark.implicits._
    val pool = cosineTopK(queries, candidates, idCol, vecCol, poolSize)
      .join(candidates.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv")), "neighbor_id")
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("sim").cast("double"), col("__cv"))
      .as[(Long, Long, Double, Seq[Double])]
    pool.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.toArray.sortBy(_._2) // id order: deterministic base
        val n = cands.length
        val vecs = cands.map(_._4.toArray)
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
          if (na == 0.0 || nb == 0.0) 0.0
          else math.rint(dot / math.sqrt(na * nb) * 1e6) / 1e6
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val maxSimToSel = Array.fill(n)(0.0)
        val chosen = Array.fill(n)(false)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
        var rank = 1L
        while (rank <= k && selected.length < n) {
          var best = -1; var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!chosen(i)) {
              val red = if (selected.isEmpty) 0.0 else maxSimToSel(i)
              val score = math.rint(
                (lambda * cands(i)._3 - (1 - lambda) * red) * 1e6) / 1e6
              if (score > bestScore ||
                  (score == bestScore && (best < 0 || cands(i)._2 < cands(best)._2))) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          chosen(best) = true
          selected += best
          out += ((qid, rank, cands(best)._2, bestScore))
          var j = 0
          while (j < n) {
            if (!chosen(j)) {
              val s = cos(vecs(j), vecs(best))
              if (s > maxSimToSel(j)) maxSimToSel(j) = s
            }
            j += 1
          }
          rank += 1
        }
        out.iterator
      }
      .toDF("query_id", "rank", "id", "mmr_score")
  }
}
