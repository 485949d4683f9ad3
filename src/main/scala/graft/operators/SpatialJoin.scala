package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-blocked spatial proximity self-join — the 2-D member of the
  * blocked-pair family ([[IntervalJoin]] bins time, [[Dedup]] bands
  * hashes, this tiles the plane): all point pairs within `radius` in L2,
  * without the quadratic cross join.
  *
  * Plan shape: each point maps to a `radius`-sized grid cell; the LEFT
  * side explodes to its 3×3 cell neighborhood (row-local ×9), the join
  * is an EQUI-join on the cell key, and the exact squared-distance
  * predicate runs per candidate. A qualifying pair is emitted exactly
  * ONCE with no distinct pass: the partner's own cell is a unique member
  * of the 3×3 neighborhood (the anchor-cell argument, 2-D form). Compared
  * pairs are bounded by points-per-cell-neighborhood — local density,
  * never corpus size. Hot cells (a dense city) are an AQE skew-join
  * story, same as the interval bins.
  *
  * Exactness: coordinates are caller-provided integer units and the
  * predicate is dx²+dy² ≤ r² in DECIMAL(38,0) — no float distance, no
  * trig, so any engine replays it bit-for-bit. (For geographic data,
  * project to local integer meters first; at city scale the
  * equirectangular error is far below any dedup radius.) Cell indexing
  * uses floor division built from `pmod`, so negative coordinates tile
  * correctly (a plain integer `/` truncates toward zero and would merge
  * the two cells around the origin).
  */
object SpatialJoin {

  /** Exact floor division: x − pmod(x, d) is exactly divisible, and the
    * division runs in DECIMAL so a >2^53 coordinate can't round the way
    * Spark's double `/` on longs would. */
  private def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))).cast(org.apache.spark.sql.types.DecimalType(38, 0))
      / lit(d)).cast("long")

  /** All pairs (id_a < id_b) with squared L2 distance ≤ radius², plus
    * the exact `dist2`. Nulls in coordinates fail loudly — a null point
    * is not "far away", it is a data bug. */
  def proximityPairs(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    require(radius > 0, s"radius must be > 0, got $radius")
    val guard = (c: String) => when(col(c).isNull,
      raise_error(concat(lit(s"proximityPairs: null $c"))).cast("long"))
      .otherwise(col(c).cast("long"))
    val pts = points.select(col(idCol).as("__id"),
      guard(xCol).as("__x"), guard(yCol).as("__y"))
      .withColumn("__cx", floorDiv(col("__x"), radius).cast("long"))
      .withColumn("__cy", floorDiv(col("__y"), radius).cast("long"))

    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
    val probes = pts.select(col("__id").as("id_a"), col("__x").as("xa"),
        col("__y").as("ya"), col("__cx"), col("__cy"),
        explode(offsets).as("__o"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("__cx") + col("__o.dx")).as("__jx"),
        (col("__cy") + col("__o.dy")).as("__jy"))
    val build = pts.select(col("__id").as("id_b"), col("__x").as("xb"),
      col("__y").as("yb"), col("__cx").as("__jx"), col("__cy").as("__jy"))

    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dx = (col("xa") - col("xb")).cast(d38)
    val dy = (col("ya") - col("yb")).cast(d38)
    probes.join(build, Seq("__jx", "__jy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", (dx * dx + dy * dy).cast("long"))
      .filter(col("dist2") <= radius * radius)
      .select(col("id_a"), col("id_b"), col("dist2"))
  }
}
