package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009,
  * public) — the standard hybrid-retrieval combiner: given N ranked
  * lists over the same id space (BM25 keywords, vector ANN, recency,
  * ...), score each id by Σ_legs 1/(kRrf + rank_leg(id)), treating
  * absence from a leg as a zero contribution. Rank arithmetic only — no
  * score normalization across legs, which is why RRF is the default
  * fuser for RAG retrieval stacks (BM25 scores and cosine similarities
  * are not commensurable; ranks are).
  *
  * Determinism/exactness: ranks are integers, each term is one
  * correctly-rounded IEEE division, and the fold adds the legs in their
  * given (fixed) order — so the fused score is bit-identical across
  * engines and partitionings, and the whole fusion sits under a DuckDB
  * hash (q212). Ties break by id.
  *
  * Scale shape: the legs are by contract TOP-K outputs — each a
  * parameter-bounded frame (per query), so the N−1 full-outer joins and
  * the final ranking window touch ≤ Σ|leg| rows per query, never the
  * corpus. The corpus-scale work lives in the legs themselves (the
  * persisted BM25/IVF index probes); fusion is a bounded postfix. With
  * `queryCols` the window partitions per query; without, the
  * unpartitioned window is bounded by the same contract.
  */
object Rrf {

  /** Fuse named ranked lists. Each leg is (name, frame) where the frame
    * carries `queryCols`, `idCol`, and `rankCol` (1-based, unique per
    * (query, id) — a rank list, not a score table). Output:
    * queryCols ++ (rank, idCol, r_<name>..., rrf_score), top `topK` per
    * query by (rrf_score DESC, id ASC); `r_<name>` is null where the
    * leg missed the id. */
  def fuse(legs: Seq[(String, DataFrame)], idCol: String, rankCol: String,
      topK: Int, kRrf: Int = 60, queryCols: Seq[String] = Nil): DataFrame = {
    require(legs.size >= 2, s"fusion needs at least 2 legs, got ${legs.size}")
    require(legs.map(_._1).distinct.size == legs.size,
      s"leg names must be distinct, got ${legs.map(_._1)}")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    // reserved-name audit (the Skyline.frontier2D discipline): withColumn
    // on "rank"/"rrf_score" and the r_<name> leg columns would silently
    // REPLACE a colliding id/query column and corrupt the output
    val legCols = legs.map { case (name, _) => s"r_$name" }
    val reserved = Seq("rank", "rrf_score") ++ legCols
    val keyCols = idCol +: queryCols
    keyCols.foreach { c =>
      require(!reserved.contains(c),
        s"column '$c' collides with a reserved output column ($reserved)")
    }
    val keyed = legs.map { case (name, df) =>
      df.select(queryCols.map(col) ++ Seq(col(idCol),
        col(rankCol).cast("long").as(s"r_$name")): _*)
    }
    val joined = keyed.reduce((a, b) =>
      a.join(b, (queryCols :+ idCol).toIndexedSeq, "full_outer"))
    // fixed leg order: coalesce(1/(k+r_0), 0) + coalesce(1/(k+r_1), 0) + …
    // — deterministic double arithmetic, never an order-arbitrary SUM
    val score = legs.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(kRrf) + col(s"r_$name")), lit(0.0))
    }.reduce(_ + _)
    // single-query fusion: the frame is ≤ Σ|leg| rows, so the global
    // window is parameter-bounded (BoundedWindow's constant key)
    val w = (if (queryCols.isEmpty)
        Window.partitionBy(BoundedWindow.key(col(idCol)))
      else Window.partitionBy(queryCols.map(col): _*))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    joined.withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(queryCols.map(col) ++ Seq(col("rank"), col(idCol)) ++
        legs.map { case (name, _) => col(s"r_$name") } :+ col("rrf_score"): _*)
  }
}
