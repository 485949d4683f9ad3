package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Leakage-safe train/val/test split: [[deterministicSplit]] keyed on
    * the NEAR-DUP COMPONENT instead of the document id, so two
    * near-duplicate documents can never straddle splits — the
    * train/test-contamination hole a row-wise split leaves open (a
    * paraphrased copy of a training document in the eval set inflates
    * every metric it touches). `pairs` is any similarity pair frame
    * (exact Jaccard, MinHash, SimHash — the [[Dedup]] family);
    * components come from the star-contraction
    * [[Components.connectedComponents]] (O(log² n) bounded-shuffle
    * rounds), documents in no pair form singleton groups keyed by their
    * own id. Output adds (`group_key`, `split`): split is a pure
    * function of group_key, so the no-straddle guarantee is structural,
    * not statistical. Fraction skew note: splits land whole GROUPS, so
    * realized fractions drift from the targets by the large-component
    * tail — by design (that tail is exactly what must not be divided).
    *
    * Scale shape: the pair graph is the expensive input (blocked
    * upstream); everything here is the contraction plus ONE id-keyed
    * left join and a row-local hash — no new corpus-scale shuffle
    * beyond the join. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      idACol: String, idBCol: String, salt: String,
      weights: Seq[(String, Double)]): DataFrame = {
    val comps = Components.connectedComponents(pairs, idACol, idBCol)
      .select(col("node").as("__ls_node"), col("component").as("__ls_comp"))
    val keyed = df.join(comps, df(idCol) === col("__ls_node"), "left")
      .withColumn("group_key", coalesce(col("__ls_comp"), df(idCol)))
      .drop("__ls_node", "__ls_comp")
    deterministicSplit(keyed, "group_key", salt, weights)
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

  /** Deterministic epoch-based replication — the UPSAMPLING half of corpus
    * mixing ([[mixture]] only downsamples). Training mixes routinely run a
    * small high-quality corpus for more than one epoch per pretraining
    * pass (the mixture-weight recipes of DoReMi / published LLM data
    * cards): epochs e = 2.25 means every doc in that stratum appears
    * twice and a deterministic 25% hash-chosen subset appears a third
    * time. Values below 1 degrade to plain [[hashSample]] downsampling
    * (0.25 → one copy for a 25% subset, zero for the rest), so one map
    * expresses a whole mixing schedule in either direction.
    *
    * Output: input rows replicated with an `epoch` column (1-based copy
    * index) so copies are distinct rows downstream — [[shuffleShards]]
    * separates them across shards; dedup would re-merge them, so
    * upsample AFTER curation.
    *
    * Scale shape: the epochs map compiles to a literal CASE chain (no
    * join, the strata list is small by nature) and replication is a
    * row-local `explode(sequence(...))` — zero shuffle, partition-
    * invariant, reproducible on any engine (same md5 hex-bucket contract
    * as [[hashSample]]). Output size is the caller's explicit intent,
    * bounded by ceil(max epochs) × input.
    *
    * Nesting: with one salt the extra-copy subset at fraction f is a
    * subset of the one at f' > f — ramping a mix weight up between runs
    * reuses every previously selected copy. */
  def epochMixture(df: DataFrame, idCol: String, stratumCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      salt: String = "epoch:"): DataFrame = {
    (epochs.values.toSeq :+ defaultEpochs).foreach(e =>
      require(e >= 0.0 && !e.isNaN && !e.isInfinite,
        s"epochs must be finite and >= 0, got $e"))
    val bucket = hashBucket(col(idCol), salt)
    def copies(e: Double): Column = {
      val whole = math.floor(e).toLong
      val frac = e - whole
      // strict < against floor(frac * 2^32): integral e keeps exactly
      // `whole` copies (threshold 00000000 never admits)
      if (frac == 0.0) lit(whole)
      else lit(whole) + when(bucket < hexThreshold(frac), 1L).otherwise(0L)
    }
    val nCopies = epochs.toSeq.sortBy(_._1).foldLeft(copies(defaultEpochs)) {
      case (acc, (s, e)) => when(col(stratumCol) === s, copies(e)).otherwise(acc)
    }
    // sequence(1, 0) would step BACKWARDS ([1, 0]); zero-copy rows need an
    // explicit empty array so explode drops them
    df.withColumn("epoch", explode(
      when(nCopies >= 1L, sequence(lit(1L), nCopies))
        .otherwise(array().cast("array<bigint>"))))
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
  /** Token-budget cap: per stratum, keep documents in deterministic
    * hash-priority order until the cumulative weight (token count) reaches
    * `budget` — the "at most N tokens per source/language" mixture op.
    *
    * Semantics (the contract the oracle and spec pin): order each
    * stratum's rows by (hashBucket, id); a row is kept iff its INCLUSIVE
    * running weight sum is <= budget. Deterministic, reproducible across
    * engines, nested under resampling with the same salt.
    *
    * Scale shape — the naive form is a window cumsum partitioned by
    * stratum, which plans as ONE partition per stratum: a 100 TB corpus
    * with a billion-document stratum would sort a billion rows on one
    * task. This implementation gets the identical answer with a two-pass
    * prefix-histogram plan:
    *
    *   1. bucket rows by the first 4 hex chars of their hash (65 536
    *      prefix cells); aggregate per-(stratum, prefix) weight sums — a
    *      bounded-size frame (|strata| × 65 536 worst case) regardless of
    *      corpus size;
    *   2. window-cumsum THAT small frame to classify each prefix cell:
    *      entirely under budget (keep all), entirely over (drop all), or
    *      the single straddling cell per stratum;
    *   3. rows in kept cells pass with no sort at all; only the straddling
    *      cell's rows — ~1/65 536 of the stratum — go through the exact
    *      per-row cumsum window.
    *
    * So the full-data passes are a narrow agg and a broadcast-joined
    * filter; the only sort touches a 2^-16 sliver. `SamplingSpec` proves
    * bit-identical output vs the naive window form on randomized inputs.
    *
    * Weights must be nonnegative (token counts are): a negative weight
    * would make the per-cell cumsum non-monotone and silently break the
    * keep/drop/straddle classification, so the first negative weight
    * encountered FAILS the job (a codegen'd raise_error guard — same
    * fail-loud philosophy as the integral-type check). A zero-weight row
    * sitting exactly at the budget boundary is kept (cum == budget).
    * A null stratum is its own partition with its own budget, exactly as
    * `Window.partitionBy(stratum)` groups it in the naive form (the cell
    * join is null-safe). */
  def tokenBudgetSample(df: DataFrame, idCol: String, weightCol: String,
      stratumCol: String, budget: Long, salt: String = "budget:"): DataFrame = {
    require(budget >= 0, s"budget must be nonnegative, got $budget")
    // integral weights only: a double column would silently truncate in
    // the long cast below and the "cumsum <= budget" contract would stop
    // matching any engine that sums exactly (token counts are integers)
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"tokenBudgetSample needs an integral weight column, got $weightCol: ${other.simpleString}")
    }
    val outCols = df.columns.toSeq
    val reserved = Set("__bucket", "__pfx", "__w", "__wsum", "__cum",
      "__cum_before", "__verdict", "__cell_stratum", "__cell_pfx")
    require(outCols.forall(!reserved.contains(_)),
      s"column names $reserved are reserved by tokenBudgetSample")

    // fail-loud negative-weight guard, evaluated distributively inside
    // codegen: the first bad row aborts the job with the offending value
    val guardedW = when(col(weightCol) < 0, raise_error(concat(
        lit(s"tokenBudgetSample: negative weight in $weightCol: "),
        col(weightCol).cast("string"))).cast("long"))
      .otherwise(col(weightCol).cast("long"))
    val rows = df.withColumn("__bucket", hashBucket(col(idCol), salt))
      .withColumn("__pfx", substring(col("__bucket"), 1, 4))
      .withColumn("__w", guardedW)

    // pass 1: bounded prefix histogram + its (small-frame) running sum
    val wPfx = Window.partitionBy(col(stratumCol)).orderBy(col("__pfx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = rows.groupBy(col(stratumCol), col("__pfx"))
      .agg(sum(col("__w")).as("__wsum"))
      .withColumn("__cum", sum(col("__wsum")).over(wPfx))
      .withColumn("__cum_before", col("__cum") - col("__wsum"))
      .withColumn("__verdict",
        when(col("__cum") <= budget, "keep_all")
          .when(col("__cum_before") > budget, "drop_all")
          .otherwise("straddle"))
      .select(col(stratumCol).as("__cell_stratum"), col("__pfx").as("__cell_pfx"),
        col("__cum_before"), col("__verdict"))

    // pass 2: join the cell verdicts back onto the full data. NULL-SAFE on
    // the stratum (<=> is still a hash-join equality key): groupBy and
    // Window.partitionBy both treat null as one ordinary group, so a plain
    // equality join here would silently drop null-stratum rows instead of
    // budgeting them as their own partition like the naive window form.
    // No explicit broadcast hint: cells is |strata| x 65 536 worst case —
    // tiny for the typical source/language strata (AQE broadcasts it), but
    // a caller stratifying by a high-cardinality key (per-domain budgets)
    // must not be forced into an oversized broadcast; the planner picks.
    val classified = rows.join(cells,
        col(stratumCol) <=> col("__cell_stratum") &&
          col("__pfx") === col("__cell_pfx"))
      .drop("__cell_stratum", "__cell_pfx")
    val keptWhole = classified.filter(col("__verdict") === "keep_all")

    // exact per-row cut inside the (at most one per stratum) straddling cell
    val wRow = Window.partitionBy(col(stratumCol))
      .orderBy(col("__bucket").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = classified.filter(col("__verdict") === "straddle")
      .withColumn("__cum",
        col("__cum_before") + sum(col("__w")).over(wRow))
      .filter(col("__cum") <= budget)

    keptWhole.select(outCols.map(col): _*)
      .unionByName(boundary.select(outCols.map(col): _*))
  }

  /** Per-stratum top-fraction selection by score — "keep the best third
    * of each language by LM quality", the CCNet head-selection /
    * top-X%-by-quality curation op. Keeps, per stratum, the
    * ceil(fraction × n) best rows by (score DESC, id ASC) — exactly the
    * `row_number` window semantics, which is what the q83 oracle pins.
    *
    * Scale shape — the naive form is `row_number().over(partitionBy
    * (stratum).orderBy(score))`: ONE partition per stratum, a
    * billion-row sort on one task for a big language. This gets the
    * identical answer with the [[tokenBudgetSample]] two-pass histogram
    * plan, binned by score VALUE instead of hash prefix:
    *
    *   1. one narrow aggregate takes per-stratum (min, max, n) — k =
    *      ceil(n × fraction) derives in the same small frame;
    *   2. each row maps to one of `bins` equal-width score cells (the
    *      stats frame broadcast-joins back); per-(stratum, cell) counts
    *      window-cumsum in cell order — a bounded small frame;
    *   3. cells entirely inside k keep whole with NO sort; only the one
    *      straddling cell per stratum row-sorts (ties can't span cells:
    *      equal scores share a cell by construction, so the cell cut is
    *      exact).
    *
    * Degenerate case, documented: a stratum whose scores are all equal
    * collapses to one cell and that cell's sort is the whole stratum —
    * continuous quality/LM scores don't do this; a constant score column
    * means the caller wanted [[hashSample]] anyway.
    *
    * Score hygiene: null/NaN scores fail loudly (codegen raise_error) —
    * NaN would poison the min/max bin arithmetic and silently misplace
    * rows, same philosophy as tokenBudgetSample's negative-weight guard.
    * Descending only; pass `-score` for bottom-fraction. */
  def topFractionByScore(df: DataFrame, idCol: String, scoreCol: String,
      stratumCol: String, fraction: Double, bins: Int = 65536): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction $fraction outside [0, 1]")
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val outCols = df.columns.toSeq
    val reserved = Set("__score", "__bin", "__n", "__k", "__min", "__max",
      "__cnt", "__cum", "__cum_before", "__verdict", "__rn",
      "__cell_stratum", "__cell_bin", "__stat_stratum")
    require(outCols.forall(!reserved.contains(_)),
      s"column names $reserved are reserved by topFractionByScore")

    val guarded = when(col(scoreCol).isNull || isnan(col(scoreCol).cast("double")),
        raise_error(concat(
          lit(s"topFractionByScore: null/NaN score in $scoreCol at $idCol="),
          col(idCol).cast("string"))).cast("double"))
      .otherwise(col(scoreCol).cast("double"))
    val rows = df.withColumn("__score", guarded)

    // pass 1: per-stratum stats; k derives here (one small frame)
    val stats = rows.groupBy(col(stratumCol))
      .agg(min(col("__score")).as("__min"), max(col("__score")).as("__max"),
        count(lit(1)).as("__n"))
      .withColumn("__k", ceil(col("__n") * lit(fraction)).cast("long"))
      .select(col(stratumCol).as("__stat_stratum"),
        col("__min"), col("__max"), col("__k"))

    // equal-width value cells, best score -> cell 0 (null-safe stratum
    // join for the same reason as tokenBudgetSample's). stats is ONE ROW
    // PER STRATUM by construction — always broadcast it: left to the
    // planner this join can become a SortMergeJoin keyed on the stratum
    // alone, i.e. a full-data exchange into |strata| partitions (5
    // languages -> 5 partitions of a 100 TB corpus). The cells join below
    // stays planner-chosen like tokenBudgetSample's: its key fans out
    // 65 536-wide, and |strata| x bins can be genuinely too big to force.
    val binned = rows.join(broadcast(stats),
        col(stratumCol) <=> col("__stat_stratum"))
      .withColumn("__bin",
        when(col("__max") === col("__min"), lit(0))
          // descending ratio: top-fraction fills best-score-first
          .otherwise(OrderStats.clampedBin((col("__max") - col("__score")) /
            (col("__max") - col("__min")), bins)))
      .drop("__stat_stratum", "__min", "__max")

    // pass 2: per-cell counts + running sum, classified against k
    val wBin = Window.partitionBy(col(stratumCol)).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = binned.groupBy(col(stratumCol), col("__bin"))
      .agg(count(lit(1)).as("__cnt"), first(col("__k")).as("__kk"))
      .withColumn("__cum", sum(col("__cnt")).over(wBin))
      .withColumn("__cum_before", col("__cum") - col("__cnt"))
      .withColumn("__verdict",
        when(col("__cum") <= col("__kk"), "keep_all")
          .when(col("__cum_before") >= col("__kk"), "drop_all")
          .otherwise("straddle"))
      .select(col(stratumCol).as("__cell_stratum"), col("__bin").as("__cell_bin"),
        col("__cum_before"), col("__kk"), col("__verdict"))

    val classified = binned.drop("__k").join(cells,
        col(stratumCol) <=> col("__cell_stratum") &&
          col("__bin") === col("__cell_bin"))
    val keptWhole = classified.filter(col("__verdict") === "keep_all")

    // exact cut inside the (at most one per stratum) straddling cell
    val wRow = Window.partitionBy(col(stratumCol))
      .orderBy(col("__score").desc, col(idCol).asc)
    val boundary = classified.filter(col("__verdict") === "straddle")
      .withColumn("__rn", row_number().over(wRow))
      .filter(col("__cum_before") + col("__rn") <= col("__kk"))

    keptWhole.select(outCols.map(col): _*)
      .unionByName(boundary.select(outCols.map(col): _*))
  }

  /** Deterministic corpus shuffle into training shards: adds `shard`
    * (equal-width hash range, 0..nShards-1) and `pos` (the row's rank
    * within its shard in hash order). Reading shards in order of
    * (shard, pos) visits the corpus in a fixed pseudo-random permutation —
    * the "globally shuffle 100 TB before training" op, with no global
    * sort: ordering is established per shard, so the plan is one
    * nShards-way hash exchange plus independent in-partition sorts. Pick
    * nShards so a shard fits an executor (e.g. 100k shards at 100 TB →
    * ~1 GB sorts); more shards = smaller sorts, perfect parallelism.
    *
    * Shard assignment is by RANGE over the hash value (bucket * nShards
    * >> 32), not modulo — identical to comparing against the
    * [[hexThreshold]] ladder, so the assignment is reproducible in any
    * engine that can compare strings (the q75 oracle re-derives it in
    * DuckDB as a CASE chain without parsing hex at all). The product
    * stays inside a signed long: v < 2^32 and nShards < 2^31 give
    * v * nShards < 2^63. Ids must be unique (the usual corpus contract):
    * duplicate ids tie on (bucket, id) and draw an arbitrary relative
    * rank. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "shuffle:"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val reserved = Set("__bucket", "shard", "pos")
    require(df.columns.forall(!reserved.contains(_)),
      s"column names $reserved are reserved by shuffleShards")
    // bucket value v < 2^32 and nShards <= Int.MaxValue keep v * nShards
    // inside a long; floor(v * n / 2^32) == the hexThreshold range index
    val v = conv(col("__bucket"), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__bucket").asc, col(idCol).asc)
    df.withColumn("__bucket", hashBucket(col(idCol), salt))
      .withColumn("shard", shiftrightunsigned(v * nShards, 32).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__bucket")
  }

  /** Materialize [[shuffleShards]] as the layout a training job reads:
    * `partitionBy(shard)` parquet with ONE file per shard whose row order
    * IS the shuffle order (repartition by shard, sort within partitions
    * by (pos) before the write — parquet preserves in-file row order, so
    * a reader streaming shard files in shard order visits the corpus in
    * the fixed global permutation with zero read-time sorting).
    *
    * Scale shape: one nShards-way hash exchange + independent in-partition
    * sorts — the same plan as shuffleShards itself; no global sort at
    * write OR read. Pick nShards so one shard ≈ one comfortable task. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      salt: String = "shuffle:"): Unit =
    shuffleShards(df, idCol, nShards, salt)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

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

  /** Deterministic weighted sample WITHOUT replacement, k rows, inclusion
    * probability proportional to weight — Efraimidis–Spirakis A-ES made
    * RNG-free: each row's reservoir key is u^(1/w) with u an md5-derived
    * uniform, and the sample is the k largest keys. The weighted
    * counterpart to [[hashSample]] (unweighted) and [[tokenBudgetSample]]
    * (budget-capped): "draw 100k documents, long documents proportionally
    * more often" — importance-weighted corpus subsampling.
    *
    * Determinism contract (what the q94 oracle pins): u = (v + 0.5)/2^32
    * with v the first 8 md5 hex chars of (salt ++ ":" ++ id) — the
    * +0.5 keeps u strictly inside (0, 1) so u^(1/w) never collapses to
    * 0/1; key = round(u^(1/w), 6) with ties broken by id ASC. The round-6
    * absorbs last-ulp pow() differences across engines (the q28 cosine
    * recipe); rounding ties are broken deterministically, so both engines
    * select the identical row set. Same salt ⇒ same sample on any
    * partitioning of the same data.
    *
    * Scale shape: one narrow map computes keys, then ONE TakeOrdered
    * top-k (per-partition heaps + driver merge of k·nPartitions rows) —
    * no global sort, no shuffle of the data itself. k rows land on the
    * driver-side of the plan, so pick k like any limit: bounded by what
    * the next stage can hold (for corpus-scale k, chain [[hashSample]]
    * first or shard by stratum). Weights must be strictly positive:
    * w <= 0 has no A-ES meaning (1/w diverges) and fails the job loudly,
    * null weights likewise. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "ws"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val outCols = df.columns.toSeq
    require(!outCols.contains("__ws_key"),
      "column name __ws_key is reserved by weightedSample")
    val guardedW = when(col(weightCol).isNull || col(weightCol) <= 0,
        raise_error(concat(
          lit(s"weightedSample: nonpositive weight in $weightCol: "),
          coalesce(col(weightCol).cast("string"), lit("null")))).cast("double"))
      .otherwise(col(weightCol).cast("double"))
    val u = (conv(substring(md5(concat(lit(salt + ":"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) /
      4294967296.0
    df.withColumn("__ws_key", round(pow(u, lit(1.0) / guardedW), 6))
      .orderBy(col("__ws_key").desc, col(idCol).asc)
      .limit(k)
      .select(outCols.map(col): _*)
  }

  /** Temperature-based source balancing (the UniMax / α-sampling
    * mixture every LLM data pipeline runs): per-stratum mass m_i (an
    * integral weight column, summed exactly), sampling share
    * p_i ∝ m_i^α, and the per-stratum row budget ⌊p_i · budget⌋. α < 1
    * flattens the natural distribution toward uniform (α = 0 IS
    * uniform, α = 1 is proportional — no rebalancing), which is how a
    * giant web crawl is kept from drowning small high-quality sources.
    *
    * Determinism discipline: the share denominator Σ m_j^α is a SUM OF
    * DOUBLES, so it is computed as a running total over the stratum's
    * lexicographic order and read back as max(cumulative) — every
    * engine adds in the same order, so the shares are bit-reproducible
    * (the float-sum trap, solved by ordering instead of decimal
    * routing, which powers of non-grid doubles preclude). α = 0.5 runs
    * on `sqrt` (correctly rounded per IEEE 754 — oracle-safe); other α
    * use `pow`, which is libm-dependent and therefore spec'd, not
    * oracled. Output: (stratum, mass, share, target_rows), one row per
    * stratum — parameter-bounded, orderable by the caller. */
  def temperatureShares(df: DataFrame, stratumCol: String,
      weightCol: String, alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha outside [0, 1]")
    require(budget >= 0, s"budget must be nonnegative, got $budget")
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"temperatureShares needs an integral weight column, got $weightCol: ${other.simpleString}")
    }
    val powered =
      if (alpha == 0.5) sqrt(col("mass").cast("double"))
      else if (alpha == 0.0) lit(1.0)
      else if (alpha == 1.0) col("mass").cast("double")
      else pow(col("mass").cast("double"), alpha)
    val wRun = BoundedWindow.ordered(col("stratum"), col("stratum"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = BoundedWindow.ordered(col("stratum"), col("stratum"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(col(weightCol).cast("long")).as("mass"))
      .withColumn("__s", powered)
      .withColumn("__cum", sum(col("__s")).over(wRun))
      .withColumn("share", col("__s") / max(col("__cum")).over(wAll))
      .withColumn("target_rows",
        floor(col("share") * budget).cast("long"))
      .select(col("stratum"), col("mass"), col("share"), col("target_rows"))
  }
}
