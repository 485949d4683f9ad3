package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repeated-substring deduplication at token granularity (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", public):
  * find every maximal run of tokens covered by a w-token shingle that
  * occurs at least `minCount` times in the whole corpus (intra-doc
  * repetitions count — a doc that repeats its own sentence is as
  * degenerate as two docs sharing it), and optionally rewrite the corpus
  * with those runs removed. The reference's pipelines dedup whole rows
  * before insert (`api_rapid/insert_csv_to_postgres.py:61`); this is the
  * sub-document generalization a training-data pipeline needs.
  *
  * Scale shape: shingle occurrences are (id: 8B, pos: 4B, h: 8B) rows —
  * the ONLY data that ever shuffles; shingle text is hashed row-locally
  * (xxhash64 over the joined tokens) and never leaves the row. The
  * repeated-hash set comes from one map-side-combined count aggregate and
  * joins back by h (data-dependent size, so a join — not a collected
  * literal like the pigeonhole-bounded boilerplate hot set). Span
  * merging is a per-document window (documents are small; the partition
  * key is the id), and the rewrite anti-joins covered (id, pos) pairs —
  * token text rejoins by id exactly once. A 64-bit hash collision can
  * only add a false repeated shingle (never lose one); at 100 TB
  * (~2^40 shingles) the expected number of colliding pairs is ~2^16 of
  * ~2^80 — swap in a 128-bit digest if that ever matters.
  */
object SpanDedup {

  /** w-token shingle occurrences: (__id, pos, h), pos 1-based. Null text
    * reads as empty (a null would otherwise silently drop the document
    * from the rewrite's one-row-per-doc contract). */
  private def occurrences(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    docs.select(col(idCol).as("__id"),
        split(coalesce(col(textCol), lit("")), " ").as("__ts"))
      .select(col("__id"), explode(expr(
        s"""if(size(__ts) < $w, array(),
           |  transform(sequence(1, size(__ts) - $w + 1), i ->
           |    named_struct('pos', i,
           |      'h', xxhash64(concat_ws(' ', slice(__ts, i, $w))))))"""
          .stripMargin)).as("o"))
      .select(col("__id"), col("o.pos").as("pos"), col("o.h").as("h"))

  /** Internal form of [[repeatedSpans]] keeping the `__id` alias:
    * merged (overlapping-or-adjacent) covered token ranges, 1-based
    * inclusive, as (__id, span_start, span_end). */
  private def spans(docs: DataFrame, idCol: String, textCol: String,
      w: Int, minCount: Long): DataFrame = {
    require(w >= 2, s"shingle width must be >= 2, got $w")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val occ = occurrences(docs, idCol, textCol, w)
    val rep = occ.groupBy("h").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount).select("h")
    val cov = occ.join(rep, "h")
      .select(col("__id"), col("pos"), (col("pos") + w - 1).as("end"))
    // gaps-and-islands: a new island starts where this shingle's first
    // token is beyond every previous covered end + 1 (adjacent runs merge)
    val prev = Window.partitionBy("__id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy("__id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    cov
      .withColumn("__brk",
        when(col("pos") > coalesce(max("end").over(prev), lit(-1)) + 1, 1)
          .otherwise(0))
      .withColumn("__island", sum("__brk").over(run))
      .groupBy(col("__id"), col("__island"))
      .agg(min("pos").as("span_start"), max("end").as("span_end"))
      .select(col("__id"),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"))
  }

  /** Maximal repeated-token spans per document: every merged run of
    * token positions (1-based, inclusive) covered by some w-shingle
    * occurring >= minCount times corpus-wide. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int, minCount: Long = 2L): DataFrame =
    spans(docs, idCol, textCol, w, minCount)
      .withColumnRenamed("__id", idCol)

  /** Corpus rewrite with every repeated span dropped (all occurrences —
    * the analytics-form of Lee et al.'s dedup; keeping one canonical copy
    * is a policy layered on [[repeatedSpans]]). Returns one row per input
    * document: (idCol, textCol, n_tokens, n_dropped). */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int, minCount: Long = 2L): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"),
        split(coalesce(col(textCol), lit("")), " ").as("__ts"))
      .select(col("__id"), size(col("__ts")).as("__n"),
        posexplode(col("__ts")).as(Seq("__p0", "__tok")))
      .select(col("__id"), col("__n"),
        (col("__p0") + 1).cast("long").as("pos"), col("__tok"))
    val covered = spans(docs, idCol, textCol, w, minCount)
      .select(col("__id"),
        explode(expr("sequence(span_start, span_end)")).as("pos"))
    val kept = toks.join(covered, Seq("__id", "pos"), "left_anti")
      .groupBy("__id")
      .agg(
        concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, __tok))), s -> s.__tok)"))
          .as("__text"),
        count(lit(1)).as("__kept"))
    docs.select(col(idCol).as("__id"),
        size(split(coalesce(col(textCol), lit("")), " ")).cast("long")
          .as("n_tokens"))
      .join(kept, Seq("__id"), "left_outer")
      .select(col("__id").as(idCol),
        coalesce(col("__text"), lit("")).as(textCol),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__kept"), lit(0L))).cast("long")
          .as("n_dropped"))
  }
}
