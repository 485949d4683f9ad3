package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items summary as a typed Aggregator — the
  * bounded-memory answer to "what are the heavy terms/domains/keys in
  * 100 TB" when exact term counting (q47's shape) would materialize an
  * unbounded distinct-key aggregate. The summary holds at most
  * `capacity` counters PER PARTIAL regardless of cardinality, merges
  * associatively map-side like any partial aggregate, and carries the
  * classic guarantees:
  *
  *   - every item with true count > n/(capacity+1) is present;
  *   - each reported estimate undercounts by at most the summary's
  *     total decrement (≤ n/(capacity+1)).
  *
  * Exactness escape hatch (the q70/q69 oracle trick, reused by q105):
  * with capacity ≥ the true distinct count the decrement path never
  * fires and the summary IS the exact count table — a relationally
  * checkable configuration that pins insert/merge/finish end to end;
  * HeavyHittersSpec then bounds the sparse-capacity behavior the
  * oracle can't replay.
  *
  * Scale shape: ONE two-phase aggregate; the shuffle carries at most
  * `capacity` (term, count) pairs per map partition. Determinism note:
  * which NON-guaranteed items survive a sparse-capacity summary is
  * merge-order-dependent (inherent to MG on a distributed reduce), so
  * production callers read it as "candidates + lower bounds" — the
  * guaranteed heavies are always there. */
object HeavyHitters {

  final case class Summary(counts: Map[String, Long])

  final class MisraGries(capacity: Int)
      extends Aggregator[String, Summary, Map[String, Long]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    override def zero: Summary = Summary(Map.empty)

    private def add(s: Summary, item: String, by: Long): Summary = {
      val m = s.counts
      m.get(item) match {
        case Some(c) => Summary(m.updated(item, c + by))
        case None if m.size < capacity => Summary(m.updated(item, by))
        case None =>
          // decrement-all by the smallest of (by, min counter): the
          // batched MG step (Agarwal et al.'s mergeable-summaries form)
          val dec = math.min(by, m.values.min)
          val kept = m.flatMap { case (k, c) =>
            val c2 = c - dec; if (c2 > 0) Some(k -> c2) else None
          }
          val rest = by - dec
          if (rest > 0) Summary(kept.updated(item, rest)) else Summary(kept)
      }
    }

    override def reduce(s: Summary, item: String): Summary = add(s, item, 1L)

    override def merge(a: Summary, b: Summary): Summary =
      b.counts.foldLeft(a) { case (s, (k, c)) => add(s, k, c) }

    override def finish(s: Summary): Map[String, Long] = s.counts
    override def bufferEncoder: Encoder[Summary] = Encoders.product[Summary]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** The summary of `itemCol` as a (item, est_count) frame, heaviest
    * first (count desc, item asc). */
  def summarize(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string")).as[String]
    val m = items.select(
      new MisraGries(capacity).toColumn.name("m")).head()
    m.toSeq.toDF("item", "est_count")
      .orderBy(col("est_count").desc, col("item"))
  }
}
