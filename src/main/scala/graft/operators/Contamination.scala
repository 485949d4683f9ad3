package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for training corpora: which corpus
  * documents contain a benchmark document's content?
  *
  * Metric: n-gram CONTAINMENT of the benchmark doc in the corpus doc —
  * |shingles(c) ∩ shingles(b)| / |shingles(b)| — not Jaccard: a benchmark
  * item pasted into a much longer document has low Jaccard but containment
  * ≈ 1, which is exactly the case that matters for eval integrity.
  *
  * Scale shape: identical to the shingle set-similarity join ([[Dedup]]) —
  * 8-byte shingle hashes only ([[graft.functions.expressions.ShingleHashes]],
  * no n-gram strings), one shuffle per side on the shingle key, candidate
  * volume bounded by the benchmark side (small by nature: eval sets are
  * thousands of docs, not billions). For very large corpora the benchmark
  * shingle set fits in memory → flip the join to broadcast and the corpus
  * side never shuffles at all.
  */
object Contamination {

  /** (corpus_id, bench_id, containment) for pairs with containment >=
    * minContainment. Corpus and benchmark must share the id/text schema;
    * overlapping ids are allowed (self-pairs are NOT filtered — disjoint
    * id spaces are the caller's contract). */
  def ngramContainment(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      minContainment: Double = 0.8): DataFrame = {
    val cs = Dedup.shingles(corpus, idCol, textCol, n)
    val bs = Dedup.shingles(bench, idCol, textCol, n).cache()
    val bn = bs.groupBy("sid").agg(count(lit(1)).as("n_b"))
      .withColumnRenamed("sid", "bench_id")
    // the benchmark shingle set is small by nature (eval sets are thousands
    // of docs) — broadcast it so the corpus side never shuffles for the join
    val inter = cs.select(col("sid").as("corpus_id"), col("shingle"))
      .join(broadcast(bs.select(col("sid").as("bench_id"), col("shingle"))), "shingle")
      .groupBy("corpus_id", "bench_id").agg(count(lit(1)).as("i"))
    inter.join(bn, "bench_id")
      .withColumn("containment", col("i").cast("double") / col("n_b"))
      .filter(col("containment") >= minContainment)
      .select(col("corpus_id"), col("bench_id"),
        round(col("containment"), 6).as("containment"))
  }
}
