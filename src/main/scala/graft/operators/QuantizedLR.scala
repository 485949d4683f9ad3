package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality scorer: logistic regression fitted by
  * full-batch gradient descent with a FIXED round count — the learned
  * fusion stage a curation pipeline runs over its rule/perplexity/
  * entropy signals (weak supervision: distill a hard rule gate, or a
  * small set of human labels, into a smooth score cheap enough to rank
  * 100 TB).
  *
  * Two deliberate design choices make training bit-reproducible across
  * engines, partitionings, and cluster sizes (the q81 Lloyd's-unrolling
  * discipline applied to GD):
  *
  *  - **Hard-sigmoid link** σ̃(z) = clamp(z/4 + 1/2, 0, 1) (the
  *    piecewise-linear logistic approximation standard in quantized
  *    networks; public) instead of exp-based σ: every scoring operation
  *    is an exactly-rounded IEEE multiply/add/clamp, so two engines
  *    computing σ̃ from identical inputs get identical bits — no
  *    cross-libm exp() drift can enter the weights.
  *  - **Fixed-point gradient accumulation**: each row's gradient
  *    contribution (σ̃(w·x) − y)·x_j is floor-quantized to a 1e-6 grid
  *    and summed as exact integer arithmetic, so the distributed sum is
  *    order-free — the one place GD touches accumulation order is made
  *    exact, the same move [[Exact.dsum]] makes for decimal sums (and
  *    immune to the double→DECIMAL cast-boundary trap that quotient
  *    features would hit there).
  *
  * Together: weights after k rounds are a deterministic function of the
  * data alone, and the whole chain (features → k updates → scores →
  * buckets) replays relationally under one DuckDB hash (q217).
  *
  * Scale shape: one narrow aggregate per round (F+1 integer sums,
  * map-side combined), a (F+1)-value driver collect per round, scoring
  * is a row-local codegen map. No shuffle anywhere; rounds and F are
  * small constants.
  *
  * Replayability contract on inputs: feature values must themselves be
  * cross-engine-exact doubles — integers, or single quotients of
  * integers (exactly-rounded division of identical operands). Chained
  * float pipelines (perplexities, tf-idf) work fine for TRAINING
  * QUALITY but sit outside the relational-replay guarantee.
  */
object QuantizedLR {

  /** Null/NaN-poisoning guard (the [[Drift.binCounts]] philosophy): a
    * null feature silently drops out of `sum` and skews the gradient;
    * fail loudly instead. */
  private def guarded(name: String): Column = {
    val c = col(name).cast("double")
    when(c.isNull || isnan(c),
      raise_error(lit(s"QuantizedLR: null/NaN/uncastable value in $name"))
        .cast("double"))
      .otherwise(c)
  }

  /** The linear term w·x folded in fixed feature order:
    * ((w0 + w1·x1) + w2·x2) + … — the exact association the oracle SQL
    * mirrors. */
  private def linear(featureCols: Seq[String], w: Array[Double]): Column =
    featureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * guarded(c)
    }

  /** Hard sigmoid σ̃(z) = max(0, min(1, 0.25·z + 0.5)). */
  private def hardSigmoid(z: Column): Column =
    greatest(lit(0.0), least(lit(1.0), lit(0.25) * z + lit(0.5)))

  /** Fit `rounds` full-batch GD rounds over `featureCols` against the
    * 0/1 `labelCol`. Returns the weight vector with the intercept at
    * index 0 and featureCols(j) at index j+1; initial weights are zero.
    * Update per round: w_j ← w_j − lr·(S_j/n)/10⁶ with
    * S_j = Σ_rows floor((σ̃(w·x) − y)·x_j · 10⁶) summed as BIGINT. */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
      lr: Double, rounds: Int): Array[Double] = {
    require(featureCols.nonEmpty, "at least one feature column required")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(lr > 0, s"learning rate must be positive, got $lr")
    val n = df.count()
    require(n > 0, "cannot fit on an empty frame")
    val y = {
      val c = col(labelCol).cast("double")
      when(c.isNull || (c =!= 0.0 && c =!= 1.0),
        raise_error(lit(s"QuantizedLR: label $labelCol must be 0 or 1"))
          .cast("double"))
        .otherwise(c)
    }
    var w = Array.fill(featureCols.length + 1)(0.0)
    for (_ <- 0 until rounds) {
      val err = hardSigmoid(linear(featureCols, w)) - y
      val grads =
        sum(floor(err * lit(1e6))).as("s0") +:
          featureCols.zipWithIndex.map { case (c, j) =>
            sum(floor((err * guarded(c)) * lit(1e6))).as(s"s${j + 1}")
          }
      val s = df.agg(grads.head, grads.tail: _*).collect().head
      w = w.indices.map { j =>
        w(j) - lr * ((s.getLong(j).toDouble / n.toDouble) / 1e6)
      }.toArray
    }
    w
  }

  /** The fitted score σ̃(w·x) as a column over `featureCols` — in
    * [0, 1], row-local, codegen-friendly. */
  def scoreCol(featureCols: Seq[String], w: Array[Double]): Column = {
    require(w.length == featureCols.length + 1,
      s"weight vector length ${w.length} != 1 + ${featureCols.length} features")
    hardSigmoid(linear(featureCols, w))
  }
}
