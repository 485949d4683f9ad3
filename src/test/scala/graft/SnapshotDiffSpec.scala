package graft

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldSnap = Seq(
    (1L, "a", 10),
    (2L, "b", 20),
    (3L, "c", 30),
    (4L, Option.empty[String].orNull, 40))
    .toDF("id", "s", "n")

  test("inserted / deleted / updated / unchanged classify correctly") {
    val newSnap = Seq(
      (1L, "a", 10),      // unchanged
      (2L, "B", 20),      // updated (payload differs)
      (4L, null, 40),     // unchanged (null == null under null-safe eq)
      (5L, "e", 50))      // inserted; 3 deleted
      .toDF("id", "s", "n")
    val d = SnapshotDiff.diff(oldSnap, newSnap, "id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(d === Map(
      2L -> ("updated", "B"),
      3L -> ("deleted", "c"),
      5L -> ("inserted", "e")))
    // includeUnchanged surfaces the rest
    val all = SnapshotDiff.diff(oldSnap, newSnap, "id",
        includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) === "unchanged")
    assert(all(4L) === "unchanged")
    assert(all.size === 5)
  }

  test("null payload transitions are updates, not noise") {
    val newSnap = Seq(
      (4L, "now-set", 40),                       // null -> value
      (1L, Option.empty[String].orNull, 10),     // value -> null
      (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "s", "n")
    val d = SnapshotDiff.diff(oldSnap, newSnap, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "updated", 4L -> "updated"))
  }

  test("identical snapshots diff to nothing; schema mismatch is rejected") {
    assert(SnapshotDiff.diff(oldSnap, oldSnap, "id").count() === 0L)
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(oldSnap, oldSnap.drop("n"), "id")
    }
  }

  test("one shuffle per side: a single full-outer join, no extra pass") {
    val plan = SnapshotDiff.diff(oldSnap, oldSnap, "id")
      .queryExecution.executedPlan.toString
    assert("FullOuter".r.findAllIn(plan).size === 1, s"plan:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }
}
