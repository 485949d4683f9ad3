package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.VectorExpressions.simhash64
import graft.functions.expressions.SketchExpressions.minhash_sig
import graft.functions.expressions.ShingleHashes.shingle_hashes

/** Document deduplication operators for training-data pipelines:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, containment.
  *
  * Scale design (the point of each variant):
  *  - exact:   one hash-groupBy shuffle on a 32-byte digest, never on the
  *             document text itself.
  *  - jaccard: set-similarity join — explode shingles, self-join on the
  *             shingle key. Exact but quadratic in cluster size; use when a
  *             blocking key (LSH band) has already bounded candidates.
  *  - minhash: constant-size signature per doc (k mins), LSH banding turns
  *             all-pairs into groupBy(band) — linear shuffle volume, no
  *             cross join anywhere. The 100 TB path.
  *  - simhash: single 64-bit fingerprint per doc; covering-code band join
  *             into ⌊maxHamming/2⌋+1 chunks, each tolerating one error via
  *             1-bit flip expansion on the build side (see
  *             [[hammingPairs]] for the pigeonhole argument) — exact over
  *             hamming distance, wide buckets, no distinct.
  *  - containment: asymmetric |A∩B|/|A| pairs via a one-sided
  *             ascending-df prefix filter — the subsumed-document signal
  *             Jaccard misses.
  *
  * Cache contract: the multi-pass operators (jaccard, minhash, simhash
  * pairs) cache intermediates that their own plan consumes more than once
  * and do NOT unpersist (results are lazy). Long-lived drivers looping
  * over many corpora should clearCache()/unpersist between invocations —
  * Bench and Verify do exactly that.
  */
object Dedup {

  /** Exact duplicate groups keyed by content digest.
    * Returns (text_hash, canonical_doc_id, dup_count) for groups of >= 2. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))
      .filter(col("dup_count") >= 2)

  /** Keep one row per distinct content digest (min id wins — deterministic,
    * unlike dropDuplicates). Window-based rather than agg+join-back: a
    * single shuffle on the digest, and robust to fully-identical rows
    * (same id AND same text), which a rejoin would multiply. The shuffle
    * moves full document rows; when ids are unique (the normal corpus
    * contract) prefer [[exactDedupNarrow]], whose exchanges move 24-byte
    * digest+id rows instead of the corpus. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Scale variant of [[exactDedup]]: aggregate (digest → min id) winners,
    * then semi-join the corpus on (digest, id).
    *
    * Shuffle volume: the winner aggregate exchanges 24 bytes/row
    * (map-side-combined), never the document text. The semi-join's corpus
    * side stays unshuffled whenever the winner set broadcasts (AQE decides);
    * past broadcast size it degrades to a shuffled hash join — still no
    * sort, and the window variant would have shuffled the same rows anyway.
    *
    * Contract: requires ids unique per row. A corpus containing physically
    * duplicated rows (same id AND same text) keeps every copy of a winning
    * (digest, id) — use [[exactDedup]] when that matters. */
  def exactDedupNarrow(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val winners = docs
      .select(md5(col(textCol)).as("__digest"), col(idCol).as("__wid"))
      .groupBy("__digest").agg(min(col("__wid")).as("__wid"))
    val tagged = docs.withColumn("__digest", md5(col(textCol)))
    tagged.join(winners,
        tagged("__digest") === winners("__digest") && tagged(idCol) === winners("__wid"),
        "left_semi")
      .drop("__digest")
  }

  /** (id, shingle-hash) pairs, distinct per doc — shared candidate input for
    * jaccard / minhash. Shingle identity is an 8-byte hash computed by the
    * codegen ShingleHashes expression (no n-gram string is ever built):
    * joins and shuffles move primitive longs, not text. A 64-bit collision
    * across ~1e6 distinct shingles is ~1e-7 and only perturbs one
    * intersection count by 1. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("sid"),
      explode(shingle_hashes(TextFunctions.tokens(col(textCol)), n)).as("shingle"))

  /** Exact pairwise word-n-gram Jaccard >= minJac, via set-similarity join.
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Intersection counting groups doc-ids per shingle and explodes ordered
    * pairs — one shuffle of the shingle set instead of a two-sided
    * self-join (~35% faster at bench scale, same result).
    *
    * Skew control at corpus scale: a shingle shared by s docs emits s^2/2
    * pairs from one group. `maxDocFreq` drops shingles above a document
    * frequency cap — near-stopword shingles that dominate cost but carry no
    * dedup signal. The default (MaxValue) keeps the operator exact; at
    * 100 TB set it (e.g. 10_000) and accept that jaccard is then computed
    * over the filtered shingle space. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJac: Double = 0.5,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val shAll = shingles(docs, idCol, textCol, n)
    val sh = (if (maxDocFreq == Int.MaxValue) shAll
      else {
        val hot = shAll.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select("shingle")
        shAll.join(broadcast(hot), Seq("shingle"), "left_anti")
      }).cache()
    val counts = sh.groupBy("sid").agg(count(lit(1)).as("n_sh"))
    val inter = sh.groupBy("shingle")
      .agg(sort_array(collect_list(col("sid"))).as("sids"))
      .filter(size(col("sids")) > 1)
      .select(explode(expr(
        "flatten(transform(sids, (x, i) -> " +
          "transform(slice(sids, i + 2, size(sids)), y -> struct(x AS id_a, y AS id_b))))"))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(counts.withColumnRenamed("sid", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(counts.withColumnRenamed("sid", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= minJac)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Size-gated exact Jaccard: picks the plan shape from a corpus
    * statistic, so the DEFAULT path can never hit the naive form's
    * quadratic pair explosion on a large corpus.
    *
    * Gate: document count bounds the worst damage a hot shingle can do in
    * [[ngramJaccardPairs]] — a shingle shared by s docs emits s^2/2 pairs
    * from one group and s <= nDocs, so at nDocs <= naiveMaxDocs the
    * explosion is capped regardless of skew, and the naive single-shuffle
    * plan is the measured winner (PPJoin's extra prefix/df stages dominate
    * small corpora — see DedupSpec's equality proof and the bench notes).
    * Above the gate, [[ppjoinJaccardPairs]] takes over: its ascending-df
    * prefix filter is lossless, and hot near-stopword shingles never
    * generate candidates in the first place. `count()` on a parquet source
    * is metadata-only — far cheaper than a shingle-df scan, and the
    * statistic it bounds is the worst case, not an estimate.
    *
    * Both branches return identical results (DedupSpec pins equality at 4
    * thresholds); the gate is purely a plan-shape choice.
    *
    * @param knownCount caller-supplied document count for the gate. On a
    *   parquet source `count()` is metadata-only, but callers composing
    *   this over DERIVED frames (filtered/deduped corpora, cached pair
    *   inputs) pay a real scan per invocation — pass the count they
    *   already hold and the gate costs nothing. The gate statistic bounds
    *   the worst case, so an upper bound is also safe to pass. */
  def jaccardPairsAuto(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJac: Double = 0.5,
      naiveMaxDocs: Long = 20000L,
      knownCount: Option[Long] = None): DataFrame =
    if (knownCount.getOrElse(docs.count()) <= naiveMaxDocs)
      ngramJaccardPairs(docs, idCol, textCol, n, minJac)
    else
      ppjoinJaccardPairs(docs, idCol, textCol, n, minJac)

  /** Per-doc ascending-document-frequency prefix shingles — the shared
    * candidate-seeding stage of [[ppjoinJaccardPairs]] and
    * [[containmentPairs]]: each doc keeps its `prefixLen(n_sh)` rarest
    * shingles under the global (df, shingle) total order, so hot
    * near-stopword shingles never seed candidates. `prefixLen` owns the
    * lossless-bound arithmetic INCLUDING its float slack (the slack
    * direction differs per similarity: err LONGER). Output:
    * (sid, shingle, n_sh). */
  private def dfAscendingPrefix(sh: DataFrame,
      prefixLen: Column => Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sid")).orderBy(col("df").asc, col("shingle").asc)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(df, "shingle")
      .withColumn("pos", row_number().over(w))
      .withColumn("n_sh", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sid"))))
      .filter(col("pos") <= prefixLen(col("n_sh")))
      .select(col("sid"), col("shingle"), col("n_sh"))
  }

  /** Candidate-restricted intersection counts — the shared verify stage:
    * |shingles(A) ∩ shingles(B)| per candidate (id_a, id_b) pair, with
    * `carry` columns riding through the aggregate. Only (id, 8-byte
    * hash) rows enter the exchanges. */
  private def intersectionCounts(cands: DataFrame, sh: DataFrame,
      carry: Seq[String] = Seq.empty): DataFrame =
    cands
      .join(sh.select(col("sid").as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col("sid").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(("id_a" +: "id_b" +: carry).map(col): _*)
      .agg(count(lit(1)).as("i"))

  /** Exact pairwise Jaccard via PPJoin-style prefix filtering — same
    * result as [[ngramJaccardPairs]], different scale shape.
    *
    * For Jaccard >= t, two docs with shingle-set sizes na <= nb must share
    * a shingle among the first `n - ceil(t*n) + 1` of each doc's shingles
    * under ANY global total order (prefix filter, lossless). Ordering by
    * ascending document frequency puts the rarest shingles in the prefix,
    * so hot near-stopword shingles never generate candidates — the s^2/2
    * pair blow-up of the naive shingle join disappears without the
    * `maxDocFreq` approximation. Candidates additionally pass the length
    * filter nb >= ceil(t * na) before exact verification over the full
    * shingle sets.
    *
    * Cost: one df aggregation + one per-doc window sort + a self-join on
    * PREFIX shingles only + verification joins restricted to candidates.
    * More shuffles than the naive form, but each moves a fraction of the
    * data — the trade that wins once corpora stop fitting a single
    * group's pair explosion. */
  def ppjoinJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJac: Double = 0.5): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n).cache()
    // the 1e-9 slack keeps float error in t*n from rounding the ceil UP
    // past the exact integer value, which would shorten the prefix and
    // silently drop qualifying pairs (longer prefix = safe direction)
    val prefixes = dfAscendingPrefix(sh,
      nSh => nSh - ceil(lit(minJac) * nSh - 1e-9) + 1)
    val cands = prefixes.as("x").join(prefixes.as("y"), "shingle")
      .filter(col("x.sid") < col("y.sid"))
      // length filter: J >= t forces min(na,nb) >= t * max(na,nb);
      // same float slack, erring toward keeping the candidate
      .filter(greatest(col("x.n_sh"), col("y.n_sh")) * minJac - 1e-9 <=
        least(col("x.n_sh"), col("y.n_sh")))
      .select(col("x.sid").as("id_a"), col("x.n_sh").as("na"),
        col("y.sid").as("id_b"), col("y.n_sh").as("nb"))
      .distinct()
    intersectionCounts(cands, sh, carry = Seq("na", "nb"))
      .withColumn("jaccard", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= minJac)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact shingle-containment pairs: C(A→B) = |A∩B| / |A| >= minContain
    * with A ≠ B. Output: (id_a = the CONTAINED doc, id_b = the container,
    * containment, na, nb), both directions evaluated independently.
    *
    * The asymmetric dedup semantic JACCARD structurally misses: a short
    * article quoted whole inside a long page, a shard concatenated into a
    * bundle, a boilerplate-wrapped rescrape — |A∩B|/|A∪B| is tiny when
    * nb >> na even though A is a verbatim copy, so neither the Jaccard
    * verifier nor the MinHash/SimHash screens (which target Jaccard-like
    * similarity) can find it. Containment is the signal the
    * dedup-the-quotes / drop-subsumed-documents pass needs.
    *
    * Scale shape — the [[ppjoinJaccardPairs]] prefix discipline made
    * one-sided: under the ascending-document-frequency total order, a
    * contained doc missing ALL of its first ⌊(1−t)·na⌋+1 prefix shingles
    * from B has |A∩B| ≤ na − (⌊(1−t)·na⌋+1) < t·na — so candidates join
    * A's PREFIX shingles (rarest first, hot near-stopword shingles never
    * seed candidates) against the container side's full shingle set; no
    * length filter exists for containment (the container may be any
    * size, that's the point). Verification is the same candidate-
    * restricted intersection count as the Jaccard path, over (id,
    * 8-byte hash) exchanges only. Worst case remains proportional to the
    * true answer: a corpus of near-identical docs has quadratically many
    * qualifying pairs no matter the algorithm.
    *
    * The float slack errs LONGER on the prefix (floor(x + 1e-9) + 1), the
    * lossless direction, mirroring the Jaccard prefix bound's slack. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minContain: Double = 0.8): DataFrame = {
    require(minContain > 0.0 && minContain <= 1.0,
      s"minContain must be in (0, 1], got $minContain")
    val sh = shingles(docs, idCol, textCol, n).cache()
    val counts = sh.groupBy("sid").agg(count(lit(1)).as("n_sh"))
    // slack errs LONGER on the prefix (floor(x + 1e-9) + 1), the lossless
    // direction, mirroring the Jaccard prefix bound's slack
    val prefixes = dfAscendingPrefix(sh,
      nSh => floor(lit(1.0 - minContain) * nSh + 1e-9) + 1)
    // one-directional length bound: |A∩B| <= min(na, nb), so a container
    // smaller than t*na can never qualify — kills the big-A/small-B
    // direction before its shingle sets are ever fetched (same float
    // slack discipline: erring toward KEEPING the candidate)
    val cands = prefixes.select(col("sid").as("id_a"), col("shingle"))
      .join(sh.select(col("sid").as("id_b"), col("shingle")), "shingle")
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
      .distinct()
      .join(counts.withColumnRenamed("sid", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(counts.withColumnRenamed("sid", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .filter(col("nb") >= lit(minContain) * col("na") - 1e-9)
    intersectionCounts(cands, sh, carry = Seq("na", "nb"))
      .filter(col("i").cast("double") / col("na") >= minContain)
      .select(col("id_a"), col("id_b"),
        round(col("i").cast("double") / col("na"), 6).as("containment"),
        col("na"), col("nb"))
  }

  /** MinHash signature: k permutation-mins h_i(s) = (a_i * x + b_i) mod p
    * over xxhash64 shingle hashes (p = 2^31-1 keeps the arithmetic within a
    * signed long). One codegen expression per row
    * (graft.functions.expressions.MinHashSig): the whole signature computes
    * from the row-local shingle array — no explode, no 64-column
    * min-aggregate, no shuffle until LSH banding. Docs too short to have a
    * shingle are excluded (they cannot minhash-match; matches the exploded
    * formulation, where they produced no rows). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, seed: Long = 42L): DataFrame =
    // Shingle-less docs (fewer than n tokens) are excluded via the cheap
    // token-count predicate — filtering on size(shingleArray) would force
    // the interpreted shingle transform to evaluate twice per row.
    docs.filter(size(TextFunctions.tokens(col(textCol))) >= n)
      .select(col(idCol),
        minhash_sig(shingle_hashes(TextFunctions.tokens(col(textCol)), n), k, seed)
          .as("sig"))

  /** The pair stage of [[minhashCandidatePairsCapped]]: LSH candidates
    * plus the over-cap bucket audit. `pairs` never contains a pair whose
    * ONLY collisions were in over-cap buckets; `overCapBuckets` is
    * (band_idx, band_hash, bucket_size) for every bucket the cap skipped —
    * route those documents to exact verification, or alert on them (a
    * mega-bucket is usually boilerplate the corpus should not contain). */
  case class CappedCandidates(pairs: DataFrame, overCapBuckets: DataFrame)

  /** LSH candidate pairs from minhash signatures: band the k mins into
    * `bands` slices of the signature array, hash each band, join on
    * (band_idx, band_hash). Shuffle volume is O(docs * bands) — no cross
    * join anywhere. */
  def minhashCandidatePairs(sigs: DataFrame, idCol: String,
      k: Int = 64, bands: Int = 16): DataFrame =
    minhashCandidatePairsCapped(sigs, idCol, k, bands).pairs

  /** [[minhashCandidatePairs]] with a hot-bucket guard: a bucket holding s
    * docs emits s^2/2 candidates from one join group, and boilerplate-heavy
    * corpora (site templates, licence pages) concentrate thousands of docs
    * onto a few (band_idx, band_hash) keys — the same skew failure mode the
    * PPJoin ascending-df prefix solves for raw shingles. Buckets larger
    * than `maxBucketSize` are excluded from the candidate join (bounding
    * any bucket's contribution) and REPORTED in the audit frame instead of
    * being silently processed or silently dropped.
    *
    * Recall: a true pair is lost only if EVERY band that collides it is
    * over-cap — mega-buckets are near-identical doc crowds, so their pairs
    * keep colliding in their other bands unless those are mega too; the
    * audit exists precisely to surface that case. The default cap
    * (MaxValue) keeps the operator exact and skips the bucket-size pass
    * entirely. */
  def minhashCandidatePairsCapped(sigs: DataFrame, idCol: String,
      k: Int = 64, bands: Int = 16,
      maxBucketSize: Int = Int.MaxValue): CappedCandidates = {
    // bands must tile the signature exactly: a non-divisor silently ignores
    // the signature tail, and bands > k gives empty slices whose common hash
    // degenerates the band join into a full cross product
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide the signature length k ($k)")
    require(maxBucketSize >= 2,
      s"maxBucketSize ($maxBucketSize) < 2 would drop every colliding bucket")
    val r = k / bands
    val bandCols = (0 until bands).map(b => xxhash64(slice(col("sig"), b * r + 1, r)))
    // cache: the self-join would otherwise recompute the signature subplan
    // (shingle transform + k hashes per doc) on both sides
    val allBanded = sigs.select(col(idCol).as("sid"),
        posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
      .cache()
    val (banded, audit) =
      if (maxBucketSize == Int.MaxValue)
        (allBanded, allBanded.sparkSession.emptyDataFrame
          .select(lit(0).as("band_idx"), lit(0L).as("band_hash"),
            lit(0L).as("bucket_size"))
          .limit(0))
      else {
        // the hot set is tiny by construction (each over-cap bucket holds
        // > maxBucketSize docs, so there are < n*bands/maxBucketSize of
        // them) — broadcast the keys, keep the corpus side unshuffled
        val hot = allBanded.groupBy("band_idx", "band_hash")
          .agg(count(lit(1)).as("bucket_size"))
          .filter(col("bucket_size") > maxBucketSize)
        (allBanded.join(broadcast(hot.select("band_idx", "band_hash")),
          Seq("band_idx", "band_hash"), "left_anti"), hot)
      }
    val pairs = banded.as("x").join(banded.as("y"), Seq("band_idx", "band_hash"))
      .filter(col("x.sid") < col("y.sid"))
      .select(col("x.sid").as("id_a"), col("y.sid").as("id_b"))
      .distinct()
    CappedCandidates(pairs, audit)
  }

  /** Exact Jaccard verification restricted to a candidate pair set: the
    * shared tail of every screen-then-verify dedup pipeline (MinHash LSH,
    * SimHash banding — any candidate generator). Intersections come from a
    * shingle join RESTRICTED to candidates; at scale candidates << all
    * pairs, and only (id, 8-byte shingle hash) rows enter the exchanges. */
  private def jaccardOnCandidates(cands: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, n: Int, minJac: Double): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n).cache()
    val counts = sh.groupBy("sid").agg(count(lit(1)).as("n_sh"))
    // length prefilter (PPJoin's length bound, lossless): i <= min(na, nb)
    // so jaccard <= min/max — any pair whose sizes differ by more than the
    // threshold ratio dies on two integers before its shingles ever join
    val sized = cands.select("id_a", "id_b")
      .join(counts.select(col("sid").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(counts.select(col("sid").as("id_b"), col("n_sh").as("nb")), "id_b")
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(minJac) * greatest(col("na"), col("nb")))
    intersectionCounts(sized, sh, carry = Seq("na", "nb"))
      .withColumn("jaccard", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= minJac)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Same relation as [[jaccardOnCandidates]], different physical shape for
    * the candidate-heavy regime (|candidates| ≫ |docs|, e.g. a generous
    * SimHash screen on a low-entropy corpus): each doc's sorted-distinct
    * shingle-hash ARRAY travels by id to its candidate pairs and the
    * intersection is one row-local sorted merge (`sorted_intersect_count`).
    * Cost ∝ candidates × shingles-per-doc COMPARISONS inside codegen,
    * versus candidates × shingles-per-doc ROWS through a shuffle join in
    * the exploded form — no wide groupBy, and the array side is |docs|
    * sized (broadcast when small). The exploded form stays the default:
    * its exchanges carry only (id, 8-byte hash) rows, which is the safer
    * shape when single documents can be pathologically long. */
  private def jaccardOnCandidatesViaArrays(cands: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, n: Int, minJac: Double): DataFrame = {
    val arrs = docs.select(col(idCol).as("sid"),
        shingle_hashes(TextFunctions.tokens(col(textCol)), n).as("sh_arr"))
      .withColumn("n_sh", size(col("sh_arr")))
      .filter(col("n_sh") > 0)
    cands.select("id_a", "id_b")
      .join(arrs.select(col("sid").as("id_a"), col("sh_arr").as("arr_a"),
        col("n_sh").as("na")), "id_a")
      .join(arrs.select(col("sid").as("id_b"), col("sh_arr").as("arr_b"),
        col("n_sh").as("nb")), "id_b")
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(minJac) * greatest(col("na"), col("nb")))
      .withColumn("i", graft.functions.expressions.SketchExpressions
        .sorted_intersect_count(col("arr_a"), col("arr_b")))
      .filter(col("i") > 0) // exploded form never surfaces 0-overlap pairs
      .withColumn("jaccard", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= minJac)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * exact Jaccard verification >= minJac on the candidates only.
    *
    * Because verification is exact, the output is a SUBSET of
    * [[ngramJaccardPairs]]'s answer, equal whenever the banded screen
    * recalls every qualifying pair — at (k=64, bands=16) the collision
    * probability for a pair at minJac=0.5 is 1-(1-0.5^4)^16 ≈ 0.65 per
    * band-row and in practice 100% on real near-dup distributions (dup
    * pairs sit far above the threshold); q24 pins exact equality against
    * the relational oracle on the test corpus. */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16, minJac: Double = 0.5,
      seed: Long = 42L, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, n, k, seed)
    val cands = minhashCandidatePairsCapped(sigs, idCol, k, bands, maxBucketSize)
    jaccardOnCandidates(cands.pairs, docs, idCol, textCol, n, minJac)
  }

  /** SimHash-screened exact Jaccard pairs: candidates from the pigeonhole
    * bit-chunk banding at hamming <= maxHamming (see
    * [[simhashNearDupPairs]]), then exact n-gram Jaccard verification.
    *
    * The screen is exact over HAMMING distance but approximate over
    * Jaccard: a qualifying Jaccard pair whose fingerprints differ in more
    * than maxHamming bits is missed. SimHash concentrates near-dup
    * fingerprints tightly (hamming ~ a few bits for jaccard >= 0.5 docs),
    * so a generous maxHamming makes the screen lossless in practice —
    * q67 pins exact equality with the relational all-pairs answer on the
    * test corpus at maxHamming=12 (observed max: 9). */
  def simhashScreenedJaccardPairs(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minJac: Double = 0.5,
      maxHamming: Int = 12): DataFrame =
    // array-form verification: a generous hamming radius on a low-entropy
    // corpus passes MANY candidates per doc (SimHash fingerprints
    // concentrate when every doc shares one vocabulary), which is exactly
    // the regime where per-pair array fetch beats the exploded shingle join
    jaccardOnCandidatesViaArrays(
      simhashNearDupPairs(docs, idCol, textCol, maxHamming),
      docs, idCol, textCol, n, minJac)

  /** Cross-corpus dedup: drop every doc whose content digest appears in a
    * reference corpus — "never retrain on what the last run already saw",
    * or "remove anything that exists in the eval set verbatim". The
    * workhorse form of decontamination when exact matching suffices
    * (n-gram containment, [[Contamination]], covers the pasted-fragment
    * case).
    *
    * Scale shape: the seen side reduces to DISTINCT digests (map-side
    * combined, 16 bytes each) before a left-anti join keyed on the
    * digest — document text never enters an exchange on either side, and
    * AQE broadcasts the digest set whenever it fits.
    *
    * @param digest content key; default md5 of the raw text. Pass
    *   `TextFunctions.fingerprint` for order/multiplicity-insensitive
    *   matching. */
  def dropSeenDocs(docs: DataFrame, seen: DataFrame, textCol: String,
      digest: Column => Column = md5(_)): DataFrame = {
    val seenDigests = seen.select(digest(col(textCol)).as("__digest")).distinct()
    docs.withColumn("__digest", digest(col(textCol)))
      .join(seenDigests, Seq("__digest"), "left_anti")
      .drop("__digest")
  }

  /** Corpus-level boilerplate segment removal — the line-dedup stage of
    * CCNet/RefinedWeb-style pipelines: split every document on `sep`, find
    * segments whose DOCUMENT frequency exceeds `maxDfFrac` of the corpus
    * (site headers, footers, navigation, cookie banners), and rebuild each
    * document with those segments removed, order preserved. All non-text
    * columns pass through; an `n_removed` count is appended.
    *
    * 100 TB shape: the df aggregate exchanges 8-byte segment HASHES
    * (map-side combined), never segment text; the removal itself is a
    * narrow per-row array filter against the collected hot-hash literal —
    * the corpus is never shuffled. The hot set is bounded by construction:
    * with s average segments per document, at most s / maxDfFrac segments
    * can exceed the threshold (pigeonhole over segment-document
    * incidences), e.g. ~30 segments/doc at 2% ⇒ ≤ 1500 — driver-bounded
    * metadata in the IvfIndex-centroid sense. `maxHotSegments` guards the
    * bound; exceeding it throws rather than silently truncating.
    *
    * Hashing note: frequency and membership key on xxhash64(segment). A
    * 64-bit collision could over-count a segment's df or remove an
    * innocent segment; at any feasible distinct-segment count the
    * probability is negligible, and the q57 oracle (which compares exact
    * strings) would surface it.
    *
    * @param maxDfFrac  a segment is boilerplate when its document
    *                   frequency is STRICTLY above maxDfFrac * corpus size
    * @param knownCount caller-supplied corpus size (same contract as
    *                   [[jaccardPairsAuto]]'s gate) */
  def dropCommonSegments(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", maxDfFrac: Double = 0.02,
      maxHotSegments: Int = 100000, knownCount: Option[Long] = None): DataFrame = {
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    require(sep.nonEmpty, "separator must be non-empty")
    val n = knownCount.getOrElse(docs.count())
    // null text reads as empty (the SpanDedup/chunking convention): both
    // branches below then agree — text "" and a real n_removed count,
    // instead of a NULL-poisoned n_removed in the hot branch only
    val segCol =
      split(coalesce(col(textCol), lit("")), java.util.regex.Pattern.quote(sep))
    // array_distinct: frequency counts DOCUMENTS containing the segment,
    // not occurrences — a footer repeated inside one page is not corpus
    // boilerplate
    val hot = docs
      .select(explode(array_distinct(segCol)).as("seg"))
      .select(xxhash64(col("seg")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDfFrac * n)
      .orderBy(col("df").desc, col("h").asc)
      .limit(maxHotSegments + 1)
      .collect().map(_.getLong(0))
    require(hot.length <= maxHotSegments,
      s"hot-segment set exceeds maxHotSegments=$maxHotSegments — raise the " +
        "cap or maxDfFrac; refusing to silently truncate the boilerplate set")
    if (hot.isEmpty)
      docs.withColumn(textCol, coalesce(col(textCol), lit("")))
        .withColumn("n_removed", lit(0L))
    else {
      // membership probes the sorted set by binary search: O(log |hot|)
      // per segment, where an array_contains literal scan made the rebuild
      // O(n_segments * |hot|) once the hot set approached its 100k cap
      val sortedHot = hot.sorted
      val kept = filter(segCol, s =>
        !graft.functions.expressions.SketchExpressions.in_sorted_longs(
          xxhash64(s), sortedHot))
      docs.withColumn("__kept", kept)
        .withColumn("n_removed", (size(segCol) - size(col("__kept"))).cast("long"))
        .withColumn(textCol, concat_ws(sep, col("__kept")))
        .drop("__kept")
    }
  }

  /** 64-bit SimHash fingerprint per doc: sign-sum of per-token hash bits.
    * One codegen expression per row (graft.functions.expressions.SimHash64)
    * — no explode, no 64-column aggregate, no shuffle at all. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      simhash64(TextFunctions.tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs with hamming distance <= maxHamming. EXACT,
    * not approximate, by a covering-code band join: the 64 bits split
    * into ⌊maxHamming/2⌋+1 chunks, so a qualifying pair (≤ maxHamming
    * differing bits) must have ≤ 1 error in SOME chunk (generalized
    * pigeonhole: nChunks·2 > maxHamming), and a chunk with ≤ 1 error
    * collides when one join side also publishes every 1-bit flip of its
    * chunk value. Half the chunks of the classic (maxHamming+1)-way
    * exact-chunk split means each chunk is twice as wide — the bucket key
    * space grows ~2^(w/2)-fold, which collapses the accidental-collision
    * fan-out that dominates at generous radii over concentrated
    * fingerprint distributions (the regime q67 runs: measured 31M joined
    * rows for 0.9M qualifying pairs with exact 5-bit chunks at radius 12
    * on sf0.1, ~6x fewer with 9-bit flip-expanded chunks). The flip
    * expansion costs (width+1) rows per chunk on ONE side — Σ(w_c+1) =
    * 64+nChunks rows per doc, the same order as the exact-chunk split's
    * fan-in after its wasted collisions.
    *
    * Each qualifying pair is emitted EXACTLY ONCE with no distinct and no
    * extra exchange: within a chunk at most one variant can match (the
    * exact value when 0 errors, the single erroneous-bit flip when 1),
    * and across chunks a first-tolerant-chunk filter — pure bit math on
    * the two fingerprints riding the join row, evaluated inside the
    * join's codegen stage — keeps only the smallest chunk index with
    * ≤ 1 error. The exact hamming filter sits in the same stage, so the
    * output is precisely the hamming ≤ maxHamming pair set. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingPairs(simhash(docs, idCol, textCol).cache(), idCol, "simhash", maxHamming)

  /** The covering-code band join itself, over an arbitrary 64-bit
    * fingerprint column: all (id_a < id_b) pairs within `maxHamming`
    * bits, one row each. Exposed separately so the banding math is
    * testable against brute force on synthetic fingerprints and reusable
    * for non-SimHash 64-bit sketches. */
  def hammingPairs(fps: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15, "maxHamming must be in [0, 15]")
    val nChunks = maxHamming / 2 + 1
    // balanced widths (64%n chunks of ceil, the rest floor): an all-ceil
    // split would leave the last chunk with the remainder — a narrow
    // chunk's few buckets each hold a large corpus fraction and that one
    // band degenerates toward a cross join
    val baseW = 64 / nChunks
    val nWide = 64 % nChunks
    val widths = Seq.fill(nWide)(baseW + 1) ++ Seq.fill(nChunks - nWide)(baseW)
    val offsets = widths.scanLeft(0)(_ + _)
    def mask(w: Int): Long = if (w >= 64) -1L else (1L << w) - 1
    def chunkExpr(c: Int): Column =
      shiftrightunsigned(col(fpCol), offsets(c)).bitwiseAND(lit(mask(widths(c))))
    // probe side: exact chunk values only
    val exactChunks = (0 until nChunks).map(c =>
      struct(lit(c).as("chunk_idx"), chunkExpr(c).as("chunk")))
    // build side: each chunk value plus its 1-bit flips (the ≤1-error cover)
    val variantStructs = (0 until nChunks).flatMap { c =>
      val base = chunkExpr(c)
      (base +: (0 until widths(c)).map(i => base.bitwiseXOR(lit(1L << i))))
        .map(v => struct(lit(c).as("chunk_idx"), v.as("chunk")))
    }
    val probe = fps.select(col(idCol).as("id_a"), col(fpCol).as("fp_a"),
        explode(array(exactChunks: _*)).as("b"))
      .select(col("id_a"), col("fp_a"), col("b.chunk_idx"), col("b.chunk"))
    val build = fps.select(col(idCol).as("id_b"), col(fpCol).as("fp_b"),
        explode(array(variantStructs: _*)).as("b"))
      .select(col("id_b"), col("fp_b"), col("b.chunk_idx"), col("b.chunk"))
    val xorFp = col("fp_a").bitwiseXOR(col("fp_b"))
    def chunkErrs(c: Int): Column =
      bit_count(shiftrightunsigned(xorFp, offsets(c)).bitwiseAND(lit(mask(widths(c)))))
    val firstTolerant = (0 until nChunks).reverse
      .foldLeft(lit(nChunks): Column)((later, c) =>
        when(chunkErrs(c) <= 1, lit(c)).otherwise(later))
    probe.join(build, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(xorFp))
      .filter(col("hamming") <= maxHamming && col("chunk_idx") === firstTolerant)
      .select("id_a", "id_b", "hamming")
  }
}
