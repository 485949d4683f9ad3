package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines.
  *
  * Everything keys off an md5 hash bucket of (salt ++ id): the first 8 hex
  * chars, compared LEXICOGRAPHICALLY against precomputed hex thresholds.
  * Lowercase fixed-width hex compares identically to the underlying 32-bit
  * value, and md5 is bit-identical across engines (Spark, DuckDB,
  * Postgres), so a split/sample computed here is reproducible anywhere —
  * no RNG, no partition-order dependence, stable under repartitioning and
  * re-runs. Changing `salt` draws an independent assignment.
  *
  * Scale shape: a narrow per-row map — no shuffle, no state; the split
  * column composes with partitioned writes (`partitionBy("split")`).
  */
object Sampling {

  /** floor(p * 2^32) as 8 lowercase hex chars; p in [0, 1]. */
  def hexThreshold(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"fraction $p outside [0, 1]")
    f"${math.min((p * 4294967296.0).toLong, 0xffffffffL)}%08x"
  }

  /** First 8 hex chars of md5(salt ++ id) — the portable hash bucket. */
  def hashBucket(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 8)

  /** Adds a `split` column assigning each row to the named fractions
    * (e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)), by hash
    * bucket — deterministic, disjoint, exhaustive. Fractions must sum to
    * ~1; the last split absorbs the rounding tail. */
  def deterministicSplit(df: DataFrame, idCol: String, salt: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty, "at least one split required")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${weights.map(_._2).sum}")
    val bucket = hashBucket(col(idCol), salt)
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail.dropRight(1)
      .map(hexThreshold)
    val expr2 = weights.map(_._1).zip(cuts.map(Some(_)) :+ None)
      .foldRight(lit(weights.last._1)) {
        case ((name, Some(cut)), rest) => when(bucket < cut, name).otherwise(rest)
        case ((_, None), rest) => rest
      }
    df.withColumn("split", expr2)
  }

  /** Deterministic ~fraction sample: keeps a row iff its hash bucket falls
    * below floor(fraction * 2^32). Applied per row, so it is stratified by
    * construction over any grouping whose ids hash uniformly. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String): DataFrame =
    // fraction 1.0 short-circuits: the strict < against the clamped
    // "ffffffff" threshold would drop buckets equal to the max value
    if (fraction >= 1.0) df
    else df.filter(hashBucket(col(idCol), salt) < hexThreshold(fraction))

  /** Deterministic corpus mixing: combine named corpora at target mixture
    * proportions by DOWNSAMPLING only (no replication), emitting the
    * largest possible mixture that honors the proportions exactly in
    * expectation.
    *
    * Solving for rates: with corpus sizes n_i and target proportions p_i,
    * the binding corpus is the one with the smallest n_i / p_i; the total
    * mixture size is T = min_i(n_i / p_i) and corpus i samples at rate
    * p_i * T / n_i (the binding corpus keeps everything). Each row then
    * passes the same portable md5 hex-bucket filter as [[hashSample]] —
    * zero shuffle, reproducible anywhere, stable under repartitioning.
    *
    * Counts are parquet-metadata cheap; the output carries a `source`
    * column naming each row's corpus. Proportions must be positive;
    * schemas must match (union semantics). */
  def mixture(corpora: Seq[(String, DataFrame, Double)], idCol: String,
      salt: String = "mix:"): DataFrame = {
    require(corpora.nonEmpty, "at least one corpus required")
    require(corpora.forall(_._3 > 0.0), "mixture proportions must be > 0")
    val totalP = corpora.map(_._3).sum
    val sized = corpora.map { case (name, df, p) =>
      (name, df, p / totalP, df.count().toDouble)
    }
    // an empty corpus would make t = min(n_i/p_i) = 0 and silently sample
    // every OTHER corpus at rate 0 — fail loudly instead
    sized.foreach { case (name, _, _, n) =>
      require(n > 0, s"corpus '$name' is empty; a mixture honoring its " +
        "proportion by downsampling would be empty — drop it or fix the input")
    }
    val t = sized.map { case (_, _, p, n) => n / p }.min
    sized.map { case (name, df, p, n) =>
      val rate = math.min(1.0, p * t / n)
      // per-corpus salt: the same id appearing in two corpora draws
      // independent keep-decisions instead of correlated ones
      hashSample(df, idCol, rate, salt + name)
        .withColumn("source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Per-stratum deterministic sampling — the corpus-balancing op (cap an
    * over-represented language at 10%, keep low-resource strata whole).
    * Each row keeps iff its hash bucket falls under ITS stratum's fraction;
    * strata absent from the map use `defaultFraction`.
    *
    * Still a narrow per-row map: the strata table is small by nature, so
    * the fraction lookup compiles to a literal CASE chain — no join, no
    * shuffle, no state. Same salt ⇒ nested samples (a 0.25 sample of a
    * stratum is a subset of its 0.5 sample), same portability contract as
    * [[hashSample]]. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      salt: String = "strat:"): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction $f outside [0, 1]"))
    val bucket = hashBucket(col(idCol), salt)
    def keep(f: Double): Column =
      if (f >= 1.0) lit(true) else bucket < hexThreshold(f)
    val decision = fractions.toSeq.sortBy(_._1)
      .foldRight(keep(defaultFraction)) { case ((stratum, f), rest) =>
        when(col(stratumCol) === stratum, keep(f)).otherwise(rest)
      }
    df.filter(decision)
  }
}
