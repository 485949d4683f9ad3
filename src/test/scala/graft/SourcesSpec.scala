package graft

import graft.sources.{FakeDataGenerator, HttpSource}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("fake-data generator is deterministic and partition-count invariant") {
    val a = FakeDataGenerator.users(spark, 100, seed = 7, numPartitions = 1).collect()
    val b = FakeDataGenerator.users(spark, 100, seed = 7, numPartitions = 8).collect()
    assert(a.sortBy(_.uuid).toSeq === b.sortBy(_.uuid).toSeq)
    val c = FakeDataGenerator.users(spark, 100, seed = 8).collect()
    assert(a.map(_.uuid).toSet !== c.map(_.uuid).toSet)
  }

  test("generated users have valid shapes") {
    val users = FakeDataGenerator.users(spark, 50).collect()
    assert(users.length === 50)
    assert(users.map(_.uuid).distinct.length === 50, "uuids unique")
    users.foreach { u =>
      assert(u.uuid.length === 22)
      assert(u.birthdate.matches("\\d{8}"))
      assert(u.phone_number.matches("010-\\d{4}-\\d{4}"))
      assert(u.email.contains("@"))
    }
  }

  test("http retry backs off on 429 then succeeds") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val client = new HttpSource.HttpClient {
      var n = 0
      override def get(url: String) = { calls += url; n += 1
        if (n < 3) (429, "") else (200, "ok") }
    }
    val r = HttpSource.getWithRetry(client, "u", sleeper = sleeps += _)
    assert(r === Right("ok"))
    assert(calls.size === 3)
    assert(sleeps.toSeq === Seq(60000L, 120000L), "min(60*2^r,3600) schedule")
  }

  test("http retry gives up after maxRetries and surfaces other statuses") {
    val always429 = new HttpSource.HttpClient {
      override def get(url: String) = (429, "") }
    assert(HttpSource.getWithRetry(always429, "u",
      HttpSource.RetryPolicy(maxRetries = 2), _ => ()) === Left(429))
    val err500 = new HttpSource.HttpClient {
      override def get(url: String) = (500, "boom") }
    assert(HttpSource.getWithRetry(err500, "u", sleeper = _ => ()) === Left(500))
  }

  test("pagination stops on short page") {
    // pages of 3, 3, 2 -> stops after third page (2 < 3)
    val pages = Map(0 -> Seq(1, 2, 3), 1 -> Seq(4, 5, 6), 2 -> Seq(7, 8))
    val got = HttpSource.paginate(first = 0, pageSize = 3) { c =>
      (pages.getOrElse(c, Seq.empty), c + 1)
    }
    assert(got === Seq(1, 2, 3, 4, 5, 6, 7, 8))
  }

  test("backoff formula caps at 3600s") {
    val p = HttpSource.RetryPolicy()
    assert(p.delaySec(0) === 60)
    assert(p.delaySec(3) === 480)
    assert(p.delaySec(10) === 3600)
  }

  test("rate limiter schedules each call one interval after the last") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rl = new HttpSource.RateLimiter(5.0, sleeps += _) // 5 req/s = 200ms gap
    (1 to 4).foreach(_ => rl.acquire())
    // the fake sleeper doesn't advance the clock, so waits accumulate by
    // one ~200ms interval per call: ≈(200, 400, 600) — i.e. the limiter
    // books each call one interval after the previous slot
    assert(sleeps.size === 3, s"first call free, rest paced: $sleeps")
    sleeps.zipWithIndex.foreach { case (s, i) =>
      val expected = 200L * (i + 1)
      assert(math.abs(s - expected) <= 20, s"sleep $i was $s, expected ~$expected")
    }
  }

  test("csv validation fails fast on missing required columns") {
    val dir = java.nio.file.Files.createTempDirectory("csvv").toString + "/f"
    val df = Seq((1L, "a")).toDF("id", "name")
    graft.sinks.Sinks.writeCsv(df, dir)
    val ok = graft.sources.CsvSource.readValidated(spark, dir, df.schema,
      required = Seq("id", "name"))
    assert(ok.count() === 1)
    val err = intercept[IllegalArgumentException] {
      graft.sources.CsvSource.readValidated(spark, dir, df.schema,
        required = Seq("id", "value", "timestamp"))
    }
    assert(err.getMessage.contains("value"))
    assert(err.getMessage.contains("timestamp"))
  }
}
