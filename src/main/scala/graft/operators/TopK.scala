package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator (SURVEY §7.3's reserved custom
  * aggregate).
  *
  * The window-function form (`row_number().over(...) <= k`) must shuffle and
  * sort EVERY candidate row; this Aggregator keeps a k-bounded heap per
  * group on the map side, so the shuffle carries at most k entries per
  * (partition, group) — the reduction that makes per-query top-k viable when
  * candidates number in the billions.
  */
object TopK {

  /** (id, score) entry; ordering by (score desc, id asc) — ties broken by id
    * for run-to-run determinism. */
  type Entry = (Long, Double)

  private def lt(a: Entry, b: Entry): Boolean =
    a._2 < b._2 || (a._2 == b._2 && a._1 > b._1)

  /** Buffer: a min-heap of the best k entries (head = current worst). */
  final case class Buf(entries: List[Entry])

  final class TopKAggregator(k: Int) extends Aggregator[Entry, Buf, Seq[Entry]] {
    override def zero: Buf = Buf(Nil)

    private def insert(buf: Buf, e: Entry): Buf = {
      if (buf.entries.size < k) Buf((e :: buf.entries).sortWith(lt))
      else if (lt(buf.entries.head, e)) Buf((e :: buf.entries.tail).sortWith(lt))
      else buf
    }

    override def reduce(b: Buf, e: Entry): Buf = insert(b, e)
    override def merge(a: Buf, b: Buf): Buf = b.entries.foldLeft(a)(insert)
    override def finish(b: Buf): Seq[Entry] =
      b.entries.sortWith((x, y) => lt(y, x)) // best first
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Per-group top-k over a Dataset of (group, id, score). Returns
    * (group, rank, id, score) rows, rank starting at 1. */
  def topKPerGroup(ds: Dataset[(Long, Long, Double)], k: Int): Dataset[(Long, Long, Long, Double)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k)
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn)
      .flatMap { case (g, entries) =>
        entries.zipWithIndex.map { case ((id, score), i) => (g, (i + 1).toLong, id, score) }
      }
  }
}
