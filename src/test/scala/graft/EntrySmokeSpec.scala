package graft

/** The driver's t1 smoke contract: SparkEntry.entry returns rows on the
  * sf0.001 fixture. Pinned as a spec so a refactor can't silently break
  * the one query the driver calls by name. */
class EntrySmokeSpec extends SparkSpec {
  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
