package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.Schemas.FakeUser

/** Seeded synthetic-data source (SURVEY S12/U1) — the engine-native form of
  * the reference's faker-based generator (generate_fake_data.py:7-32).
  *
  * Distributed and deterministic: `spark.range(n)` partitions the id space
  * across executors and every field derives from a per-row RNG seeded with
  * f(globalSeed, id) — the same rows come back no matter the parallelism,
  * which the reference's `faker` cannot guarantee. That makes it usable as a
  * reproducible test fixture and a scale-up load generator (n = 10^12 works:
  * no driver-side materialization anywhere).
  */
object FakeDataGenerator {

  private val firstNames = Vector("kim", "lee", "park", "choi", "jung", "kang",
    "cho", "yoon", "jang", "lim", "han", "oh", "seo", "shin", "kwon", "hwang")
  private val lastNames = Vector("minjun", "seoyeon", "doyun", "haeun", "siwoo",
    "jiwoo", "juwon", "somin", "yejun", "chaewon", "jiho", "yuna")
  private val jobs = Vector("engineer", "teacher", "designer", "analyst",
    "nurse", "chef", "writer", "pilot", "farmer", "lawyer")
  private val cities = Vector("seoul", "busan", "incheon", "daegu", "daejeon",
    "gwangju", "suwon", "ulsan")
  private val bloodGroups = Vector("A+", "A-", "B+", "B-", "O+", "O-", "AB+", "AB-")
  private val sexes = Vector("M", "F")

  /** Base58-ish alphabet for short uuids (shortuuid fidelity: 22 chars,
    * no 0/O/I/l — generate_fake_data.py:20). */
  private val b58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  def users(spark: SparkSession, n: Long, seed: Long = 42L,
      numPartitions: Int = 0): Dataset[FakeUser] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    // fixed epoch instead of now(): determinism for tests; callers wanting
    // wall-clock stamps overwrite with current_timestamp() downstream
    val baseMillis = 1704067200000L // 2024-01-01T00:00:00Z
    spark.range(0, n, 1, parts).map { id =>
      val rnd = new scala.util.Random(seed * 0x9E3779B97F4A7C15L + id)
      def pick[T](v: Vector[T]) = v(rnd.nextInt(v.size))
      val first = pick(firstNames); val last = pick(lastNames)
      val uuid = Seq.fill(22)(b58(rnd.nextInt(b58.length))).mkString
      val birthYear = 1950 + rnd.nextInt(55)
      val birthMonth = 1 + rnd.nextInt(12)
      val birthDay = 1 + rnd.nextInt(28)
      FakeUser(
        uuid = uuid,
        name = s"$first $last",
        job = pick(jobs),
        residence = pick(cities),
        blood_group = pick(bloodGroups),
        sex = pick(sexes),
        birthdate = f"$birthYear%04d$birthMonth%02d$birthDay%02d",
        phone_number = f"010-${rnd.nextInt(10000)}%04d-${rnd.nextInt(10000)}%04d",
        email = s"$first.$last${rnd.nextInt(1000)}@example.com",
        timestamp = new Timestamp(baseMillis + (id * 1000) % 86400000L))
    }
  }
}
