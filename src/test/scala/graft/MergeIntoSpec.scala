package graft

import org.apache.spark.sql.functions._

import graft.operators.{IntervalJoin, MergeInto}

/** MergeInto (CDC apply) and IntervalJoin.overlapJoin: semantics on hand
  * fixtures, compaction ordering, loud-failure guards, and the overlap
  * join's single-emission + equivalence-to-theta-join properties. */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "en", 10L), (2L, "de", 20L), (3L, "fr", 30L)
  ).toDF("id", "lang", "n")

  test("upsert, delete, insert, and untouched keys in one merge") {
    val changes = Seq(
      (2L, "U", 1L, "xx", 21L),  // update key 2
      (3L, "D", 1L, null, 0L),   // delete key 3
      (9L, "I", 1L, "ko", 90L)   // insert fresh key 9
    ).toDF("id", "op", "seq", "lang", "n")
    val out = MergeInto.applyChanges(base, changes, "id")
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out === Seq((1L, "en", 10L), (2L, "xx", 21L), (9L, "ko", 90L)))
  }

  test("compaction: the greatest seq wins; insert-then-delete nets to absent") {
    val changes = Seq(
      (1L, "U", 1L, "aa", 11L),
      (1L, "U", 2L, "bb", 12L),  // later update wins
      (9L, "I", 1L, "ko", 90L),
      (9L, "D", 2L, null, 0L)    // inserted then deleted → absent
    ).toDF("id", "op", "seq", "lang", "n")
    val out = MergeInto.applyChanges(base, changes, "id")
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out === Seq((1L, "bb"), (2L, "de"), (3L, "fr")))
  }

  test("upserts are full-row images: change nulls overwrite base values") {
    val changes = Seq((1L, "U", 1L, null.asInstanceOf[String], 99L))
      .toDF("id", "op", "seq", "lang", "n")
    val out = MergeInto.applyChanges(base, changes, "id")
      .filter($"id" === 1L).collect()
    assert(out(0).isNullAt(1) && out(0).getLong(2) === 99L)
  }

  test("delete of an absent key is a no-op") {
    val changes = Seq((42L, "D", 1L, null.asInstanceOf[String], 0L))
      .toDF("id", "op", "seq", "lang", "n")
    assert(MergeInto.applyChanges(base, changes, "id").count() === 3)
  }

  test("duplicate (key, seq) at the winning sequence fails loudly") {
    val changes = Seq(
      (1L, "U", 5L, "aa", 1L),
      (1L, "U", 5L, "bb", 2L)
    ).toDF("id", "op", "seq", "lang", "n")
    val e = intercept[Exception] {
      MergeInto.applyChanges(base, changes, "id").count()
    }
    assert(e.getMessage != null)
  }

  test("unknown op fails loudly; schema mismatch fails at plan time") {
    val badOp = Seq((1L, "Z", 1L, "aa", 1L)).toDF("id", "op", "seq", "lang", "n")
    intercept[Exception] { MergeInto.applyChanges(base, badOp, "id").count() }
    val badCols = Seq((1L, "U", 1L, "aa")).toDF("id", "op", "seq", "lang")
    intercept[IllegalArgumentException] {
      MergeInto.applyChanges(base, badCols, "id")
    }
  }

  test("merge(base, diff-derived changeset) round-trips SnapshotDiff") {
    // derive a changeset from a diff, apply it, and land exactly on target
    val target = Seq(
      (1L, "en", 10L), (2L, "zz", 99L), (7L, "pt", 70L) // 3 deleted, 7 new
    ).toDF("id", "lang", "n")
    val d = graft.operators.SnapshotDiff.diff(base, target, "id")
    val changes = d.select($"id",
      when($"change" === "deleted", "D").otherwise("U").as("op"),
      lit(1L).as("seq"), $"lang", $"n")
    val merged = MergeInto.applyChanges(base, changes, "id")
    assert(merged.orderBy($"id").collect().toSeq ===
      target.orderBy($"id").collect().toSeq)
  }

  // ---- overlapJoin ----

  test("overlapJoin equals the naive theta join and emits each pair once") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val us = graft.operators.TimeSeriesOps.eventMicros($"ts")
    val l = ev.filter($"event_type" === "click")
      .select($"user_id".as("lu"), $"event_id".as("lid"),
        us.as("ls"), (us + 7200000000L).as("le"))
    val r = ev.filter($"event_type" === "view")
      .select($"user_id".as("ru"), $"event_id".as("rid"),
        us.as("rs"), (us + 3600000000L).as("re"))
    // binWidth much smaller than interval length → every pair shares MANY
    // bins; the anchor must still emit exactly one row per pair
    val binned = IntervalJoin.overlapJoin(l, r, "lu", "ru",
        "ls", "le", "rs", "re", binWidth = 600000000L)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    val theta = l.join(r, $"lu" === $"ru" && $"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(binned.length === binned.distinct.length, "duplicate pair emitted")
    assert(binned.sorted.toSeq === theta.sorted.toSeq)
  }

  test("overlapJoin: touching endpoints overlap; inverted intervals drop") {
    val l = Seq((1L, 10L, 0L, 100L), (1L, 11L, 500L, 400L)) // 11 inverted
      .toDF("lu", "lid", "ls", "le")
    val r = Seq((1L, 20L, 100L, 200L), (1L, 21L, 101L, 200L),
        (1L, 22L, 450L, 460L))
      .toDF("ru", "rid", "rs", "re")
    val out = IntervalJoin.overlapJoin(l, r, "lu", "ru",
        "ls", "le", "rs", "re", binWidth = 50L)
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(out.sorted.toSeq === Seq((10L, 20L))) // touch at 100 counts; 21 starts past le; 11 dropped
  }
}
