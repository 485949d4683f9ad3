package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.functions.TextFunctions.tokens
import graft.functions.UrlFunctions

/** Round-8 distribution-mining wave: Pareto/ABC mass classification,
  * Markov transition matrices, PMI collocations, robust MAD outliers, the
  * remaining classic TPC-H decision-support shapes (Q15 max-of-aggregate,
  * Q11 global-share HAVING, Q20 decorrelated dominance semi-join), and
  * URL canonicalization for web-corpus curation.
  *
  * House disciplines throughout: money/quantity arithmetic in integer
  * fixed-point units (exact and engine-portable), float quotients only as
  * single IEEE divisions of identically-derived integers, deterministic
  * total ORDER BY everywhere.
  */
object MiningQueries extends QueryModule {

  private val d4 = DecimalType(18, 4)
  private val dec38 = DecimalType(38, 0)

  /** l_extendedprice·(1−l_discount) as exact integer 1e-8-dollar units:
    * each factor rounds to 4 decimals (the d4 contract), scales to an
    * integer, and the per-row product stays well inside a long. */
  private def revenueUnits = {
    val epu = (col("l_extendedprice").cast(d4) * 10000).cast("long")
    val du = ((lit(1).cast(d4) - col("l_discount").cast(d4)) * 10000).cast("long")
    epu * du
  }

  private val revenueUnitsSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,4))*10000 AS BIGINT)
      | * CAST((1 - CAST(l_discount AS DECIMAL(18,4)))*10000 AS BIGINT)""".stripMargin

  /** ABC/Pareto classification of parts by lifetime revenue — the
    * inventory-analysis staple ("A parts carry 80% of the mass"). The
    * exact global cumulative share comes from
    * [[graft.operators.OrderStats.paretoClass]]'s two-level prefix-sum
    * plan: cell-partitioned windows plus a bounded cells pass, never one
    * task sorting every part. The oracle runs the naive global running
    * sum — equality proves the decomposition exact. */
  private def q146AbcParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg(sum(revenueUnits.cast(dec38)).cast("long").as("units"))
      .select($"l_partkey".as("p_partkey"), $"units")
    graft.operators.OrderStats.paretoClass(rev, "p_partkey", "units")
      .orderBy($"cum_units", $"p_partkey")
  }

  private val q146Sql =
    s"""WITH rev AS (
      |  SELECT l_partkey AS p_partkey,
      |    CAST(SUM($revenueUnitsSql) AS BIGINT) AS units
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT p_partkey, units,
      |    CAST(SUM(units) OVER (ORDER BY units DESC, p_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_units,
      |    SUM(units) OVER () AS total
      |  FROM rev)
      |SELECT p_partkey, units, cum_units,
      |  CASE WHEN (CAST(cum_units AS HUGEINT) - units)*100 < 80*total THEN 'A'
      |       WHEN (CAST(cum_units AS HUGEINT) - units)*100 < 95*total THEN 'B'
      |       ELSE 'C' END AS abc
      |FROM c ORDER BY cum_units, p_partkey""".stripMargin

  /** First-order Markov transition matrix over each user's event stream:
    * count and probability of event-type A being followed by B. One
    * window pass (the q33 lead shape) + one small-key aggregation; the
    * per-from-state totals frame is |event types| rows and broadcasts.
    * The probability is a single IEEE division of two exact counts —
    * deterministic across engines. */
  private def q147Transitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val us = graft.operators.TimeSeriesOps.eventMicros($"ts")
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val pairs = Tables.events(spark, dir)
      .withColumn("us", us)
      .select($"event_type".as("from_type"),
        lead($"event_type", 1).over(w).as("to_type"))
      .filter($"to_type".isNotNull)
    val counts = pairs.groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy($"from_type").agg(sum($"n").as("__tot"))
    counts.join(broadcast(totals), "from_type")
      .select($"from_type", $"to_type", $"n",
        ($"n".cast("double") / $"__tot".cast("double")).as("p"))
      .orderBy($"from_type", $"to_type")
  }

  private val q147Sql =
    """WITH s AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts), event_id) AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, COUNT(*) AS n
      |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
      |  CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
      |FROM c JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** PMI collocations: top-50 adjacent word bigrams by pointwise mutual
    * information. The PMI numerator/denominator stay exact integers
    * (c12·U², N·c1·c2 in DECIMAL(38,0)) and only the final ranking score
    * is a single division — both engines derive bit-identical doubles
    * from bit-identical integers. The bigram explode is row-local; the
    * only exchanges key on token strings (the q47 term-stats class). The
    * corpus totals U and N are 1-row aggregates of the ALREADY-aggregated
    * count frames — broadcast-attached, never a recompute of the corpus
    * pass. */
  private def q148PmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(tokens($"text").as("w"))
    val uni = docs.select(explode($"w").as("tk"))
      .groupBy($"tk").agg(count(lit(1)).as("cu"))
    val totalTokens = uni.agg(sum($"cu").cast(dec38).as("__u"))
    val bi = docs.filter(size($"w") >= 2)
      .select(explode(expr(
        "transform(slice(w, 1, size(w)-1), (x, i) -> " +
          "struct(x AS w1, element_at(w, i + 2) AS w2))")).as("b"))
      .select($"b.w1", $"b.w2")
    val cb = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val totalBigrams = cb.agg(sum($"c12").cast(dec38).as("__n"))
    val u1 = uni.select($"tk".as("w1"), $"cu".as("c1"))
    val u2 = uni.select($"tk".as("w2"), $"cu".as("c2"))
    cb.filter($"c12" >= 20)
      .join(u1, "w1").join(u2, "w2")
      .join(broadcast(totalTokens)).join(broadcast(totalBigrams))
      .select($"w1", $"w2", $"c12",
        (($"c12".cast(dec38) * $"__u" * $"__u").cast("double") /
          ($"__n" * $"c1" * $"c2").cast("double")).as("pmi"))
      .orderBy($"pmi".desc, $"w1", $"w2")
      .limit(50)
  }

  private val q148Sql =
    """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
      |u AS (SELECT unnest(w) AS tk FROM t),
      |uni AS (SELECT tk, COUNT(*) AS cu FROM u GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cu) AS HUGEINT) AS U FROM uni),
      |g AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
      |      FROM t WHERE len(w) >= 2),
      |b AS (SELECT w[i] AS w1, w[i+1] AS w2 FROM g),
      |cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM b GROUP BY 1, 2),
      |nb AS (SELECT CAST(SUM(c12) AS HUGEINT) AS N FROM cb)
      |SELECT cb.w1, cb.w2, CAST(cb.c12 AS BIGINT) AS c12,
      |  CAST(CAST(cb.c12 AS HUGEINT) * tot.U * tot.U AS DOUBLE) /
      |  CAST(nb.N * u1.cu * u2.cu AS DOUBLE) AS pmi
      |FROM cb
      |CROSS JOIN tot CROSS JOIN nb
      |JOIN uni u1 ON u1.tk = cb.w1
      |JOIN uni u2 ON u2.tk = cb.w2
      |WHERE cb.c12 >= 20
      |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin

  /** Robust per-user anomaly profile: median and MAD (median absolute
    * deviation) of the fixed-point value stream, plus the count of
    * |x − med| > 3·MAD outliers — the monitoring rule that survives the
    * skew that wrecks mean/σ z-scores. Both medians are EXACT via
    * [[graft.operators.OrderStats.exactQuantiles]]'s histogram plan (the
    * q89 rank contract: rank = ceil(0.5·n) in DOUBLE), and the outlier
    * decision is pure integer arithmetic. */
  private def q149MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", floor($"value" * 1000 + 0.5).cast("long").as("vu"))
    val med = graft.operators.OrderStats
      .exactQuantiles(ev.select($"user_id", $"vu".cast("double").as("v")),
        "v", "user_id", Seq(0.5))
      .select($"user_id", $"q".cast("long").as("med"))
    val dev = ev.join(med, "user_id").withColumn("ad", abs($"vu" - $"med"))
    val mad = graft.operators.OrderStats
      .exactQuantiles(dev.select($"user_id", $"ad".cast("double").as("v")),
        "v", "user_id", Seq(0.5))
      .select($"user_id", $"q".cast("long").as("mad"))
    dev.join(mad, "user_id")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        max($"med").as("med_units"),
        max($"mad").as("mad_units"),
        sum(when($"ad" > $"mad" * 3, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy($"user_id")
  }

  private val q149Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(floor(value*1000 + 0.5) AS BIGINT) AS vu FROM events),
      |m AS (
      |  SELECT user_id, vu,
      |    row_number() OVER (PARTITION BY user_id ORDER BY vu) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM e),
      |med AS (
      |  SELECT user_id, vu AS med FROM m
      |  WHERE rn = GREATEST(1, CAST(CEIL(0.5 * CAST(n AS DOUBLE)) AS BIGINT))),
      |d AS (
      |  SELECT e.user_id, e.vu, med.med, ABS(e.vu - med.med) AS ad
      |  FROM e JOIN med USING (user_id)),
      |m2 AS (
      |  SELECT user_id, ad,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ad) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM d),
      |mad AS (
      |  SELECT user_id, ad AS mad FROM m2
      |  WHERE rn = GREATEST(1, CAST(CEIL(0.5 * CAST(n AS DOUBLE)) AS BIGINT)))
      |SELECT d.user_id, COUNT(*) AS n, MAX(d.med) AS med_units,
      |  MAX(mad.mad) AS mad_units,
      |  CAST(SUM(CASE WHEN d.ad > 3*mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN mad USING (user_id)
      |GROUP BY 1 ORDER BY user_id""".stripMargin

  /** TPC-H Q15 shape: the top supplier(s) by 1996-Q1 shipped revenue —
    * max-of-aggregate with ties kept. The max attaches back by an
    * EQUI-join on the revenue value (broadcast, 1 row), so no correlated
    * subquery and no second scan of lineitem; supplier is the broadcast
    * dim. */
  private def q150TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(revenueUnits.cast(dec38)).cast("long").as("revenue_units"))
    val best = rev.agg(max($"revenue_units").as("__best"))
    rev.join(broadcast(best), $"revenue_units" === $"__best")
      .join(broadcast(Tables.supplier(spark, dir)),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"revenue_units")
      .orderBy($"s_suppkey")
  }

  private val q150Sql =
    s"""WITH r AS (
      |  SELECT l_suppkey,
      |    CAST(SUM($revenueUnitsSql) AS BIGINT) AS revenue_units
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name, r.revenue_units
      |FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
      |WHERE r.revenue_units = (SELECT MAX(revenue_units) FROM r)
      |ORDER BY s.s_suppkey""".stripMargin

  /** TPC-H Q11 shape: parts whose lifetime revenue exceeds 1/2000 of the
    * corpus total — the global-share HAVING. The global total is a 1-row
    * re-aggregate of the per-part frame (never a second lineitem scan)
    * and the share cut is cross-multiplied in DECIMAL(38,0) — no float
    * share. */
  private def q151PartShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byPart = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey")
      .agg(sum(revenueUnits.cast(dec38)).as("__u"))
    val total = byPart.agg(sum($"__u").as("__t"))
    byPart.join(broadcast(total))
      .filter($"__u" * 2000 > $"__t")
      .select($"l_partkey".as("p_partkey"), $"__u".cast("long").as("value_units"))
      .orderBy($"value_units".desc, $"p_partkey")
  }

  private val q151Sql =
    s"""WITH r AS (
      |  SELECT l_partkey AS p_partkey, SUM($revenueUnitsSql) AS u
      |  FROM lineitem GROUP BY 1)
      |SELECT p_partkey, CAST(u AS BIGINT) AS value_units
      |FROM r
      |WHERE u * 2000 > (SELECT SUM(u) FROM r)
      |ORDER BY value_units DESC, p_partkey""".stripMargin

  /** TPC-H Q20 shape: suppliers that dominate some part — shipped more
    * than 4× the average per-supplier quantity of a part sourced from at
    * least 5 suppliers. Both aggregates decorrelate into plain group-bys
    * over ONE lineitem pass each, the dominance cut is integer
    * cross-multiplied (sq·ns > 4·pq — no float share), and the supplier
    * names attach by LEFT SEMI join — the correlated-EXISTS surface as
    * three shuffles, no subquery re-execution per row. */
  private def q152DominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qu = ($"l_quantity".cast(d4) * 10000).cast("long")
    val li = Tables.lineitem(spark, dir)
    val sp = li.groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(qu.cast(dec38)).as("__sq"))
    val pp = li.groupBy($"l_partkey")
      .agg(sum(qu.cast(dec38)).as("__pq"),
        countDistinct($"l_suppkey").as("__ns"))
      .select($"l_partkey".as("__p"), $"__pq", $"__ns")
    val dominant = sp.join(pp, $"l_partkey" === $"__p")
      .filter($"__ns" >= 5 && $"__sq" * $"__ns" > $"__pq" * 4)
      .select($"l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  private val q152Sql =
    """WITH sp AS (
      |  SELECT l_suppkey, l_partkey,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,4))*10000 AS BIGINT)) AS sq
      |  FROM lineitem GROUP BY 1, 2),
      |pp AS (
      |  SELECT l_partkey,
      |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,4))*10000 AS BIGINT)) AS pq,
      |    COUNT(DISTINCT l_suppkey) AS ns
      |  FROM lineitem GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT sp.l_suppkey FROM sp JOIN pp ON sp.l_partkey = pp.l_partkey
      |  WHERE pp.ns >= 5 AND sp.sq * pp.ns > pp.pq * 4)
      |ORDER BY s.s_suppkey""".stripMargin

  /** URL canonicalization rollup — the C4/CCNet "dedup by normalized URL"
    * curation step over a deterministically synthesized crawl frontier
    * (the q141 synthesis pattern: fixture-derived raw URLs with scheme /
    * case / www / trailing-slash / query / fragment noise). Everything is
    * codegen regex Columns ([[graft.functions.UrlFunctions]]); the only
    * exchange keys on the registered domain. The oracle replays the exact
    * normalization chain — every stripped variant lands under the hash. */
  private def q153UrlDomains(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables.documents(spark, dir).select($"doc_id",
      concat(
        when($"doc_id" % 2 === 0, lit("https://")).otherwise(lit("HTTP://")),
        when($"doc_id" % 4 === 0, lit("WWW.")).otherwise(lit("")),
        lit("site"), ($"doc_id" % 7).cast("string"), lit(".Example."),
        when($"doc_id" % 3 === 0, lit("com"))
          .when($"doc_id" % 3 === 1, lit("ORG")).otherwise(lit("net")),
        lit("/p/"), ($"doc_id" % 100).cast("string"),
        when($"doc_id" % 6 === 0, lit("/")).otherwise(lit("")),
        when($"doc_id" % 3 === 0, lit("?utm_source=feed&ref=12")).otherwise(lit("")),
        when($"doc_id" % 5 === 0, lit("#frag")).otherwise(lit(""))).as("url"))
    raw
      .withColumn("norm", UrlFunctions.normalizeUrl($"url"))
      .withColumn("host", UrlFunctions.urlHost($"norm"))
      .withColumn("domain", UrlFunctions.registeredDomain($"host"))
      .groupBy($"domain")
      .agg(count(lit(1)).as("n_pages"),
        countDistinct($"norm").as("n_urls"),
        countDistinct($"host").as("n_hosts"),
        min($"norm").as("sample_url"))
      .orderBy($"domain")
  }

  private val q153Sql =
    """WITH raw AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END)
      |    || (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END)
      |    || 'site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.'
      |    || (CASE WHEN doc_id % 3 = 0 THEN 'com'
      |             WHEN doc_id % 3 = 1 THEN 'ORG' ELSE 'net' END)
      |    || '/p/' || CAST(doc_id % 100 AS VARCHAR)
      |    || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=12' ELSE '' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url
      |  FROM documents),
      |n AS (
      |  SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(lower(url), '#.*$', ''), '\?.*$', ''),
      |    '^[a-z][a-z0-9+.-]*://', ''), '^www\.', ''), '/$', '') AS norm
      |  FROM raw),
      |h AS (
      |  SELECT norm,
      |    regexp_replace(regexp_extract(norm, '^([^/]*)', 1), ':[0-9]+$', '') AS host
      |  FROM n),
      |d AS (
      |  SELECT norm, host,
      |    CASE WHEN contains(host, '.')
      |         THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
      |         ELSE host END AS domain
      |  FROM h)
      |SELECT domain, COUNT(*) AS n_pages,
      |  COUNT(DISTINCT norm) AS n_urls,
      |  COUNT(DISTINCT host) AS n_hosts,
      |  MIN(norm) AS sample_url
      |FROM d
      |GROUP BY domain
      |ORDER BY domain""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q146_abc_parts", q146AbcParts, Some(q146Sql),
      "Pareto/ABC revenue classification via the two-level exact prefix-sum plan"),
    Q("q147_transitions", q147Transitions, Some(q147Sql),
      "first-order Markov transition matrix over per-user event streams"),
    Q("q148_pmi_bigrams", q148PmiBigrams, Some(q148Sql),
      "top-50 PMI collocations, exact integer numerator/denominator"),
    Q("q149_mad_outliers", q149MadOutliers, Some(q149Sql),
      "per-user median/MAD robust outlier counts (exact histogram quantiles)"),
    Q("q150_top_supplier", q150TopSupplier, Some(q150Sql),
      "TPC-H Q15 shape: max-of-aggregate with ties, revenue-equality attach"),
    Q("q151_part_share", q151PartShare, Some(q151Sql),
      "TPC-H Q11 shape: global-share HAVING, cross-multiplied cut"),
    Q("q152_dominant_suppliers", q152DominantSuppliers, Some(q152Sql),
      "TPC-H Q20 shape: decorrelated dominance aggregates + semi join"),
    Q("q153_url_domains", q153UrlDomains, Some(q153Sql),
      "URL canonicalization + registered-domain rollup (web-corpus curation)"))
}
