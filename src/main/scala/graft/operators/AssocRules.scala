package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — frequent co-occurrence pairs and the
  * confidence/lift rules over them, the classic retail-analytics workload
  * (and, for a training corpus, the "terms/sources that co-occur
  * anomalously often" diagnostic).
  *
  * Exactness: every emitted quantity is a COUNT (n_ab, n_a, n_b,
  * n_baskets) and every threshold is decided by integer
  * cross-multiplication — confidence `n_ab/n_a ≥ c/100` tests
  * `100·n_ab ≥ c·n_a`; lift is left to the reader as the exact witness
  * tuple (its quotient would be the only float in the frame). Nothing
  * rounds, so DuckDB agrees bit-for-bit.
  *
  * Scale shape:
  *  - (basket, item) rows dedup first — one narrow distinct on the
  *    composite key, the only stage that sees the raw fact table.
  *  - Apriori pruning BEFORE pairing: a pair occurring in `minPairCount`
  *    baskets needs each member in at least that many, so items below
  *    the floor drop before the self-join — the long-tail item mass
  *    (most of any catalog) never enters the quadratic stage.
  *  - The pair stage self-joins per basket: a basket with k surviving
  *    items emits C(k,2) pairs, so the explosion is bounded by basket
  *    width, not catalog size — the same per-group bound as the n-gram
  *    shingle join. Exchanges carry (basket, item) id pairs only.
  *  - The basket total is one metadata-cheap distinct count collected to
  *    the driver as a single long (the TfIdf-nDocs pattern).
  */
object AssocRules {

  /** Frequent unordered pairs: (item_a, item_b, n_ab) with
    * item_a < item_b and n_ab ≥ minPairCount baskets containing both. */
  def frequentPairs(facts: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val b = facts.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val frequentItems = b.groupBy("item")
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minPairCount)
    val pruned = b.join(frequentItems.select("item"), "item")
    pruned.select(col("basket"), col("item").as("item_a"))
      .join(pruned.select(col("basket"), col("item").as("item_b")), "basket")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
  }

  /** Directed rules antecedent → consequent over [[frequentPairs]], kept
    * when `confidence = n_ab/n_ant ≥ minConfCenti/100` (integer
    * cross-multiplied). Output: (antecedent, consequent, n_ab, n_ant,
    * n_cons, n_baskets) — confidence and lift are exact quotients of the
    * witnesses (`lift = n_ab·n_baskets / (n_ant·n_cons)`). */
  def rules(facts: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long, minConfCenti: Int): DataFrame = {
    require(minConfCenti >= 0 && minConfCenti <= 100,
      s"minConfCenti must be in [0, 100], got $minConfCenti")
    val b = facts.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val nBaskets = b.select("basket").distinct().count()
    val itemCounts = b.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = frequentPairs(facts, basketCol, itemCol, minPairCount)
    val directed = pairs.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("n_ab"))
      .union(pairs.select(col("item_b"), col("item_a"), col("n_ab")))
    directed
      .join(itemCounts.select(col("item").as("antecedent"),
        col("n_item").as("n_ant")), "antecedent")
      .join(itemCounts.select(col("item").as("consequent"),
        col("n_item").as("n_cons")), "consequent")
      .filter(col("n_ab") * 100 >= col("n_ant") * minConfCenti)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_ant"), col("n_cons"), lit(nBaskets).as("n_baskets"))
  }
}
