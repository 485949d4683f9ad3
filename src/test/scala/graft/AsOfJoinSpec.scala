package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1L, 100.0, "mm1"),
    ("A", ts("2024-01-01 11:00:00"), 2L, 110.0, "mm2"),
    ("A", ts("2024-01-01 11:00:00"), 3L, 111.0, "mm3"), // tie: higher id wins
    ("B", ts("2024-01-01 10:30:00"), 4L, 200.0, "mm4"))
    .toDF("sym", "qts", "qid", "price", "source")

  private val trades = Seq(
    ("A", ts("2024-01-01 10:30:00"), 100L), // between quotes -> 100.0
    ("A", ts("2024-01-01 11:00:00"), 101L), // exactly at tie -> 111.0 (qid 3)
    ("A", ts("2024-01-01 09:00:00"), 102L), // before any quote -> null
    ("B", ts("2024-01-01 12:00:00"), 103L), // after last -> 200.0
    ("C", ts("2024-01-01 12:00:00"), 104L)) // key never quoted -> null
    .toDF("sym", "tts", "tid")

  test("as-of join picks latest quote at-or-before, ties by tie column") {
    val got = AsOfJoin.asOf(trades, quotes, "sym", "sym", "tts", "qts", "qid",
        Seq("price", "source"))
      .select($"tid", $"price", $"source")
      .as[(Long, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(100L) === ((Some(100.0), Some("mm1"))))
    assert(got(101L) === ((Some(111.0), Some("mm3"))))
    assert(got(102L) === ((None, None)))
    assert(got(103L) === ((Some(200.0), Some("mm4"))))
    assert(got(104L) === ((None, None)))
  }

  test("payload travels atomically: null payload fields stay paired") {
    val q = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, Some(100.0), None: Option[String]),
      ("A", ts("2024-01-01 11:00:00"), 2L, None: Option[Double], Some("mm2")))
      .toDF("sym", "qts", "qid", "price", "source")
    val t = Seq(("A", ts("2024-01-01 11:30:00"), 100L)).toDF("sym", "tts", "tid")
    val row = AsOfJoin.asOf(t, q, "sym", "sym", "tts", "qts", "qid",
      Seq("price", "source")).head()
    // both fields from quote qid=2 — NOT price from qid=1 + source from qid=2
    assert(row.isNullAt(row.fieldIndex("price")))
    assert(row.getAs[String]("source") === "mm2")
  }

  test("every left row survives (left-outer semantics)") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "sym", "tts", "qts", "qid",
      Seq("price"))
    assert(out.count() === trades.count())
  }

  test("null right timestamps never match (would otherwise sort before time zero)") {
    val q = Seq(
      ("A", null.asInstanceOf[Timestamp], 1L, 666.0, "phantom"),
      ("A", ts("2024-01-01 10:00:00"), 2L, 100.0, "mm1"))
      .toDF("sym", "qts", "qid", "price", "source")
    val t = Seq(
      ("A", ts("2024-01-01 09:00:00"), 100L), // before any real quote
      ("A", ts("2024-01-01 11:00:00"), 101L))
      .toDF("sym", "tts", "tid")
    val got = AsOfJoin.asOf(t, q, "sym", "sym", "tts", "qts", "qid",
        Seq("price"))
      .select($"tid", $"price").as[(Long, Option[Double])].collect().toMap
    assert(got(100L) === None, "null-ts quote must not leak as an early match")
    assert(got(101L) === Some(100.0))
  }
}
