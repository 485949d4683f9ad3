package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-stage retrieval: an ANN shortlist re-ranked by EXACT distances —
  * the standard serving pattern (FAISS/ScaNN deployments, public): a
  * compressed index (IVFADC codes, LSH buckets) produces a cheap
  * candidate set of K' ≫ k ids per query, and only those K' rows ever
  * see full-precision arithmetic. The approximation error of the first
  * stage then only matters through MEMBERSHIP (did the true top-k make
  * the shortlist), not through scores — re-ranked order is exact.
  *
  * Scale shape: the shortlist is parameter-bounded (|queries| · K'
  * rows), so it BROADCASTS onto the corpus vector scan — one broadcast
  * hash join gathers exactly the candidate vectors, the exact fold runs
  * on those K' rows per query only, and the final top-k is a per-query
  * window over ≤ K' rows. Never a corpus-wide exact pass: full-precision
  * distance arithmetic is confined to the shortlist join's output.
  *
  * Determinism: the squared-L2 fold is the house fixed-order sequential
  * fold (dim order, the [[KMeans]]/[[ProductQuantizer]] arithmetic), so
  * with a round-6 ranking key the whole two-stage chain replays
  * relationally — q215 puts shortlist + re-rank under one DuckDB hash.
  */
object Rerank {

  /** Exact squared-L2 re-rank of `shortlist` — (query_id, id) candidate
    * pairs, the house ANN output shape — against full-precision vectors.
    * Output: (query_id, rank, id, dist), top `k` per query by (dist ASC,
    * id ASC), dist = round(Σ_d (q_d − c_d)², 6) folded in dim order —
    * ranking keys on the ROUNDED distance (the [[Similarity.cosineTopK]]
    * discipline: a sub-1e-6 wobble can't flip a rank across engines). */
  def exactL2TopK(shortlist: DataFrame, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).cast("array<double>").as("__qv"))
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("__cv"))
    // corpus scans; the bounded shortlist broadcasts onto it (gathering
    // K' vectors per query), then the bounded result takes the queries
    // by broadcast too — no corpus shuffle anywhere
    val gathered = c.join(
      broadcast(shortlist.select(col("query_id"), col("id")).distinct()), "id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("id").asc)
    gathered.join(broadcast(q), "query_id")
      .withColumn("dist", round(expr(
        """aggregate(zip_with(__qv, __cv, (a, b) -> (a - b) * (a - b)),
          |  cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("dist"))
  }
}
