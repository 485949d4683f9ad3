package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 keyword search (Robertson–Spärck Jones) — the ranked retrieval
  * primitive over the corpus: score each document against a SMALL keyword
  * query and return the top-k.
  *
  * Scale shape: per-term tf is a row-local `filter(tokens, _ == term)`
  * count — NO explode, no inverted-index shuffle for a bounded query (the
  * index-build form is TfIdf's territory; for |query| ≤ a handful of
  * terms, one narrow scan beats building postings). Corpus statistics
  * (N, Σdl, per-term df) come from ONE aggregate job; the |query|+2
  * scalars collect to the driver (parameter-bounded, the TfIdf-vocab
  * pattern) and fold back in as literals. The top-k is orderBy+limit —
  * TakeOrderedAndProject, distributed, never a global sort.
  *
  * Cross-engine determinism: idf uses `StrictMath.log` (bit-identical to
  * Catalyst's and DuckDB's ln — the q48 contract) on driver-computed
  * exact counts; the score expression tree is pinned left-to-right
  * (term₁ + term₂ + …, `(1 − b) + k1·b·dl/avgdl` shapes) so IEEE doubles
  * agree; ranking keys on the ROUNDED score (6 dp) with an id tiebreak —
  * the q28 ordering discipline. */
object Bm25 {

  /** Top-k (doc, per-term tf, score) for `queryTerms`, ordered by
    * (rounded score DESC, id). */
  def search(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "at least one query term required")
    require(queryTerms.distinct.size == queryTerms.size,
      s"query terms must be distinct, got $queryTerms")
    require(k >= 1, s"k must be >= 1, got $k")
    val ws = TextFunctions.tokens(col(textCol))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(ws, _ === lit(t))).cast("long").as(s"__tf$i") }
    val base = docs.select(
      (col(idCol) +: size(ws).cast("long").as("__dl") +: tfCols): _*)

    // ONE aggregate job for N, Σdl, and each term's df
    val statAggs = count(lit(1)).as("n") +: sum(col("__dl")).as("sdl") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*).collect().head
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val idfs = queryTerms.indices.map { i =>
      val df = stats.getLong(2 + i).toDouble
      StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }

    // contribution_i = idf_i * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl));
    // summed left-to-right in query order — the oracle mirrors the tree
    val score = queryTerms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      lit(idfs(i)) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / lit(avgdl)))
    }.reduce(_ + _)

    val named = queryTerms.zipWithIndex.map { case (t, i) =>
      col(s"__tf$i").as(s"tf_$t") }
    base.select(
        (col(idCol) +: named) :+ round(score, 6).as("score"): _*)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
