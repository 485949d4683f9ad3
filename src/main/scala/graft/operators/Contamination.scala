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

  /** [[ngramContainment]] behind a Bloom-filter document prefilter — the
    * SAME exact result (bloom filters have no false negatives, and the
    * exact containment join then discards every false positive), a
    * different 100 TB shape: the benchmark's distinct shingle hashes build
    * a driver-side bloom (~2 bytes/shingle at the default 16 bits/element
    * vs ~50 bytes/entry as a broadcast join table), and candidacy becomes
    * a row-LOCAL codegen probe over each corpus doc's shingle array — a
    * clean corpus document is dismissed by a narrow filter without ever
    * exploding into shingle rows or entering a join. Only the (rare)
    * bloom-positive docs run the exact containment pipeline.
    *
    * Driver-bounded state: the collect moves the benchmark's DISTINCT
    * shingle hashes (eval sets are thousands of docs — bounded metadata in
    * the IvfIndex-centroid sense), and only the ~n/4-byte bloom ships with
    * the plan. */
  def ngramContainmentBloom(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      minContainment: Double = 0.8, bitsPerElement: Int = 16): DataFrame = {
    import graft.functions.TextFunctions
    import graft.functions.expressions.BloomExpressions
    import graft.functions.expressions.ShingleHashes.shingle_hashes
    val benchHashes = Dedup.shingles(bench, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .collect().map(_.getLong(0))
    if (benchHashes.isEmpty) {
      // no benchmark shingles -> nothing can be contaminated
      ngramContainment(corpus.limit(0), bench, idCol, textCol, n, minContainment)
    } else {
      val bloom = BloomExpressions.build(benchHashes, bitsPerElement)
      val candidates = corpus.filter(BloomExpressions.bloom_any(
        shingle_hashes(TextFunctions.tokens(col(textCol)), n), bloom))
      ngramContainment(candidates, bench, idCol, textCol, n, minContainment)
    }
  }
}
