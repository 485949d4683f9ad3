package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Index-oriented sink seam — the reference's Elasticsearch surface (K6/K7:
  * static indices and Logstash-style date-rotated indices,
  * docker-elk/logstash/pipeline/container-logs.conf:20-26).
  *
  * This environment has no es-hadoop connector (zero egress), so the engine
  * ships the SEAM a connector plugs into, with a parquet-backed default
  * writer:
  *  - index NAMING (the `logstash-%{+YYYY.MM.dd}` convention) is a Column
  *    expression, computed on executors;
  *  - ROUTING is a plain column — es-hadoop's dynamic-index write
  *    (`es.resource.write = "prefix-{__index}"`) consumes it as-is, no
  *    driver round trip;
  *  - [[writeRotated]]'s per-index loop exists only for writers without
  *    dynamic routing (like the parquet default): it iterates DISTINCT
  *    index names (bounded by the rotation period — days, not rows),
  *    filtering the frame per index so each write prunes on the routing
  *    column.
  *
  * Plugging the real connector is one lambda:
  * {{{
  * IndexSink.write(df, spec, (batch, index) =>
  *   batch.write.format("es").save(index))           // or dynamic routing:
  * IndexSink.withIndexColumn(df, spec).write.format("es")
  *   .option("es.resource.write", "{__index}").save()
  * }}}
  */
object IndexSink {

  /** Rotation granularity → date_format pattern (ES naming convention). */
  sealed abstract class Rotation(val pattern: Option[String])
  case object NoRotation extends Rotation(None)
  case object Daily extends Rotation(Some("yyyy.MM.dd"))
  case object Monthly extends Rotation(Some("yyyy.MM"))

  /** @param prefix index name or rotated-index prefix
    * @param rotation date rotation appended as `prefix-<date>`
    * @param tsCol event-time column driving the rotation */
  final case class IndexSpec(prefix: String, rotation: Rotation = NoRotation,
      tsCol: String = "ts") {
    require(prefix.nonEmpty, "index prefix must be non-empty")
  }

  /** The index name as an executor-side expression. */
  def indexName(spec: IndexSpec): Column = spec.rotation.pattern match {
    case None => lit(spec.prefix)
    case Some(p) => concat(lit(spec.prefix + "-"), date_format(col(spec.tsCol), p))
  }

  /** Frame with the routing column attached — the dynamic-routing entry
    * point for connectors that consume an index column directly. */
  def withIndexColumn(df: DataFrame, spec: IndexSpec,
      indexCol: String = "__index"): DataFrame =
    df.withColumn(indexCol, indexName(spec))

  /** Write through the seam: one `writer(batch, index)` call per distinct
    * index. Static specs dispatch a single call with the frame untouched. */
  def write(df: DataFrame, spec: IndexSpec,
      writer: (DataFrame, String) => Unit): Unit = spec.rotation match {
    case NoRotation => writer(df, spec.prefix)
    case _ => writeRotated(df, spec, writer)
  }

  private def writeRotated(df: DataFrame, spec: IndexSpec,
      writer: (DataFrame, String) => Unit): Unit = {
    val indexed = withIndexColumn(df.cache(), spec)
    // distinct index names, not data: bounded by the rotation period
    val indices = indexed.select(col("__index")).distinct()
      .collect().map(_.getString(0)).sorted
    indices.foreach { idx =>
      writer(indexed.filter(col("__index") === idx).drop("__index"), idx)
    }
    df.unpersist()
    ()
  }

  /** Parquet-backed default writer: each index becomes `rootDir/<index>` —
    * the zero-egress stand-in with the same layout semantics as one ES
    * index per name. */
  def parquetWriter(rootDir: String): (DataFrame, String) => Unit =
    (batch, index) => batch.write.mode("append").parquet(s"$rootDir/$index")
}
