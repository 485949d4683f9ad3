package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Local iteration aid: SPARK_GRAFT_ONLY=q60_fuzzy_names,q23_ngram_jaccard
    // restricts the run to a comma-separated subset (driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name)) }
    // Warmup at the smallest SF: JIT, codegen compilation, parquet reader and
    // shuffle machinery init — excluded from the timed runs below.
    selected.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache() // operators cache intermediates; don't let
                                 // entries accumulate across query runs
    }
    // Two full timed passes, minimum per query: shared/virtualized hosts
    // throttle in MINUTES-long phases (observed: a narrow 0.2 s map
    // reading 12 s, a 0.7 s aggregate reading 65 s, inside one window —
    // both normal again later). Back-to-back repeats of one query sit
    // inside the same phase, so the passes are interleaved: each query's
    // two samples land minutes apart and the min escapes any phase
    // shorter than a full pass. Failures never retry: -1 marks them
    // instead of masquerading as a fast run.
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) dt else -1.0
    }
    val pass1 = selected.map { case (name, fn) => name -> timeOnce(name, fn) }
    val pass2 = selected.map { case (name, fn) => name -> timeOnce(name, fn) }
    val results = pass1.map { case (name, t1) =>
      val t2 = pass2(name)
      name -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
