package graft

import java.sql.Timestamp
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def times(rows: Seq[(Long, Timestamp, String)], stages: Seq[String]) =
    Funnel.funnelTimes(rows.toDF("u", "ts", "e"), "u", "ts", "e", stages)
      .collect().map { r =>
        r.getLong(0) -> (1 to stages.size).map(i =>
          Option(r.getTimestamp(i))).toList
      }.toMap

  test("stages fill strictly in order; out-of-order events don't count") {
    val rows = Seq(
      // user 1: click BEFORE first view must not fill stage 2
      (1L, t("2024-01-01 10:00:00"), "click"),
      (1L, t("2024-01-01 11:00:00"), "view"),
      (1L, t("2024-01-01 12:00:00"), "click"),
      (1L, t("2024-01-01 13:00:00"), "purchase"),
      // user 2: full funnel, times are the earliest valid ones
      (2L, t("2024-01-02 09:00:00"), "view"),
      (2L, t("2024-01-02 09:30:00"), "view"),
      (2L, t("2024-01-02 10:00:00"), "purchase"), // before click: not stage 3
      (2L, t("2024-01-02 11:00:00"), "click"),
      (2L, t("2024-01-02 12:00:00"), "purchase"),
      // user 3: never views
      (3L, t("2024-01-03 08:00:00"), "click"))
    val got = times(rows, Seq("view", "click", "purchase"))
    assert(got(1L) === List(Some(t("2024-01-01 11:00:00")),
      Some(t("2024-01-01 12:00:00")), Some(t("2024-01-01 13:00:00"))))
    assert(got(2L) === List(Some(t("2024-01-02 09:00:00")),
      Some(t("2024-01-02 11:00:00")), Some(t("2024-01-02 12:00:00"))))
    assert(got(3L) === List(None, None, None))
  }

  test("equal timestamps cannot advance two stages") {
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:00:00"), "click"))
    val got = times(rows, Seq("view", "click"))
    assert(got(1L) === List(Some(t("2024-01-01 10:00:00")), None))
  }

  test("funnel == independent per-stage min-join chain on real events") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val stages = Seq("view", "click", "purchase")
    val got = Funnel.funnelTimes(ev, "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getLong(0) ->
        (1 to 3).map(i => Option(r.getTimestamp(i))).toList).toMap

    val raw = ev.select($"user_id", $"ts", $"event_type")
      .as[(Long, Timestamp, String)].collect().groupBy(_._1)
    raw.foreach { case (u, evs) =>
      var prev = Option.empty[Timestamp]
      val expected = stages.zipWithIndex.map { case (s, i) =>
        val hit = if (i == 0 || prev.nonEmpty)
          evs.filter(e => e._3 == s && prev.forall(p => e._2.after(p)))
            .sortBy(_._2.getTime).headOption.map(_._2)
        else None
        prev = hit
        hit
      }.toList
      assert(got(u) === expected, s"user $u")
    }
    assert(got.keySet === raw.keySet)
  }

  test("one shuffle: a single exchange in the funnel plan") {
    val plan = Funnel.funnelTimes(graft.core.Tables.events(spark, sfDir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"want one exchange:\n$plan")
  }

  test("duplicate stage names are rejected") {
    intercept[IllegalArgumentException] {
      Funnel.funnelTimes(Seq((1L, t("2024-01-01 00:00:00"), "a"))
        .toDF("u", "ts", "e"), "u", "ts", "e", Seq("a", "a"))
    }
  }
}
