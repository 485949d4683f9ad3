package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
  *
  * Discipline for oracle parity (enforced by tools/compare.py locally):
  *   - every output column aliased identically in both engines;
  *   - deterministic total ORDER BY in both (driver hash is order-sensitive);
  *   - double aggregation routed through [[Exact]] decimal sums;
  *   - timestamps emitted as formatted strings (second granularity).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryModule {
  def queries: Seq[Q]
}
