package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** MERGE INTO for snapshots: apply a CDC changeset (insert / update /
  * delete operations with a sequence order) to a keyed base table and
  * return the post-merge snapshot — the lakehouse upsert primitive
  * (Delta/Iceberg `MERGE`, Kafka compacted-topic materialization), and
  * the forward direction of [[SnapshotDiff]] (diff derives a changeset
  * from two snapshots; this replays a changeset onto one).
  *
  * Semantics (q133 pins them):
  *   - the changeset is COMPACTED first: per key, only the operation with
  *     the greatest `seqCol` survives (a row inserted then deleted in the
  *     same batch nets out to absent — Kafka log-compaction semantics);
  *   - 'I' and 'U' are both upserts and take the change row's payload
  *     VERBATIM (nulls included — an upsert is a full-row image, not a
  *     patch); 'D' removes the key; keys the changeset never mentions
  *     pass through untouched.
  *
  * Scale shape: the compaction is one shuffle of the DELTA only (window
  * over key — delta-sized, not base-sized); the apply is ONE outer join
  * of base against the compacted delta. The base shuffles once on the
  * key — or not at all when the delta is broadcast-sized, which is the
  * common nightly-CDC case and exactly what AQE picks when it sees the
  * compacted side's true size. Nothing is ever rescanned: cost is
  * O(base + delta), the minimum for a full-image merge.
  *
  * Loud failures (merge bugs corrupt silently otherwise):
  *   - duplicate (key, seq) AT THE WINNING sequence — the merge result
  *     would depend on tie-breaking, so it aborts via a guard folded into
  *     the surviving row (Catalyst can't prune it);
  *   - an op outside I/U/D aborts the same way;
  *   - changeset payload columns must match the base's exactly.
  */
object MergeInto {

  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val payloadCols = base.columns.filterNot(_ == keyCol).toSeq
    require(payloadCols.nonEmpty, "need at least one non-key column")
    val expected = (Seq(keyCol, opCol, seqCol) ++ payloadCols).sorted
    require(changes.columns.sorted.toSeq == expected,
      s"changeset columns ${changes.columns.sorted.toSeq} != expected $expected")

    // compact: last op per key by seq; duplicate winning seqs and unknown
    // ops fail loudly. Both guards ride ON the surviving op column so the
    // optimizer cannot prune them away. row_number and the duplicate probe
    // (lead over the SAME desc sort: the runner-up carrying the winner's
    // seq = an ambiguous winner) share one window spec, so the whole
    // compaction is a single delta-sized shuffle + sort.
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val compacted = changes
      .withColumn("__rn", row_number().over(byKey))
      .withColumn("__nextSeq", lead(col(seqCol), 1).over(byKey))
      .filter(col("__rn") === 1)
      .withColumn("__op",
        when(
          assert_true(col("__nextSeq").isNull || col("__nextSeq") =!= col(seqCol),
            concat(lit("MergeInto: duplicate (key, seq) at winning sequence, key="),
              col(keyCol).cast("string"))).isNull &&
          assert_true(upper(col(opCol)).isin("I", "U", "D"),
            concat(lit("MergeInto: unknown op '"), col(opCol), lit("'"))).isNull,
          upper(col(opCol))))

    val b = base.select(col(keyCol).as("__k_b"),
      struct(payloadCols.map(col): _*).as("__p_b"))
    val c = compacted.select(col(keyCol).as("__k_c"), col("__op"),
      struct(payloadCols.map(col): _*).as("__p_c"))

    b.join(c, col("__k_b") === col("__k_c"), "full_outer")
      // drops both live deletes and deletes of absent keys (no-ops)
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(
        (coalesce(col("__k_c"), col("__k_b")).as(keyCol) +:
          payloadCols.map(p =>
            when(col("__op").isNull, col("__p_b").getField(p))
              .otherwise(col("__p_c").getField(p)).as(p))): _*)
  }
}
