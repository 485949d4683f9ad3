package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** TF-IDF document vectorization: the classic sparse feature bridge from
  * raw text to the vector operators ([[Similarity]], [[IvfIndex]]).
  *
  * Scale shape:
  *  - [[fitVocab]] is one explode + map-side-combined term aggregation
  *    (the q47 shape) followed by a top-V cut. Only the V surviving terms
  *    pass through the final single-partition index-assignment sort — the
  *    vocabulary is small by construction (V × ~30 bytes), the corpus
  *    never is.
  *  - [[vectorize]] joins the BROADCAST vocabulary against per-doc term
  *    counts: one shuffle keyed by (doc, term) for the tf aggregate, one
  *    keyed by doc for the gather. Out-of-vocabulary terms drop at the
  *    broadcast join — no skew risk from hapax legomena.
  *
  * Determinism: vocabulary order is (df DESC, term ASC); idf uses the
  * smooth form ln((N + 1) / (df + 1)) + 1, computed once per vocab row;
  * per-doc indices are emitted sorted ascending.
  */
object TfIdf {

  /** Top-`vocabSize` terms by document frequency as (term, idx, df, idf).
    *
    * Index assignment happens driver-side over the COLLECTED top-V rows
    * (orderBy+limit plans as TakeOrdered, so the collect moves <= V
    * (term, df) pairs — bounded metadata, the IvfIndex-centroid pattern).
    * The alternative — a global row_number window after the limit — is
    * benign at <= V rows but emits WindowExec's single-partition warning,
    * and a load-bearing-benign warning would mask a real one. */
  def fitVocab(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame =
    fitVocabFromTerms(
      docs.select(col(idCol).as("__id"),
        explode(TextFunctions.tokens(col(textCol))).as("term")),
      docs.count(), vocabSize)

  /** [[fitVocab]] over pre-derived (`__id`, `term`) occurrence rows — the
    * seam that lets callers vectorize over ANY term definition (shingles,
    * normalized tokens, hashed grams) while keeping the df/idf/index
    * contract identical. `nDocs` is the corpus size for the smooth idf —
    * passed explicitly because term derivations may drop short docs. */
  def fitVocabFromTerms(termRows: DataFrame, nDocs: Long,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val top = termRows
      .groupBy("term")
      .agg(countDistinct(col("__id")).as("df"))
      // top-V cut via TakeOrdered: only V rows ever reach the driver
      .orderBy(col("df").desc, col("term").asc)
      .limit(vocabSize)
      .collect()
    val rows = top.iterator.zipWithIndex.map { case (r, i) =>
      val df = r.getLong(1)
      // StrictMath.log mirrors Catalyst's Log expression bit-for-bit, so a
      // vocabulary fit on the driver hashes identically to the window form
      (r.getString(0), i, df, StrictMath.log((nDocs + 1.0) / (df + 1.0)) + 1.0)
    }.toSeq
    termRows.sparkSession.createDataFrame(rows)
      .toDF("term", "idx", "df", "idf")
  }

  /** Sparse tf-idf vectors per document: (id, indices sorted asc, weights
    * aligned, n_terms).
    *
    * @param keepEmpty when true (default), documents with no in-vocabulary
    *                  term keep a row with empty arrays via a second pass
    *                  over the corpus ids (left join) — downstream batch
    *                  shapes stay total. Pass false to skip that join when
    *                  empty vectors carry no information for the caller. */
  def vectorize(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, keepEmpty: Boolean = true): DataFrame = {
    val tf = docs
      .select(col(idCol).as("__id"), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("__id", "term").agg(count(lit(1)).as("tf"))
    val weighted = tf
      .join(broadcast(vocab.select(col("term"), col("idx"), col("idf"))), "term")
      .withColumn("w", col("tf") * col("idf"))
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("idx"), col("w")))).as("iw"))
    val base =
      if (keepEmpty) docs.select(col(idCol).as("__id")).join(weighted, Seq("__id"), "left")
      else weighted
    base.select(
      col("__id").as(idCol),
      coalesce(transform(col("iw"), e => e.getField("idx")),
        array().cast("array<int>")).as("indices"),
      coalesce(transform(col("iw"), e => e.getField("w")),
        array().cast("array<double>")).as("weights"),
      coalesce(size(col("iw")), lit(0)).as("n_terms"))
  }
}
