package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Defaults are tuned for the test harness (local[N], single JVM) but every
  * setting here is the one we'd also want on a real cluster:
  *   - AQE on: runtime re-planning (skew joins, partition coalescing) is the
  *     main defence at 100 TB where static stats are wrong.
  *   - shuffle.partitions defaults to the local core count instead of 200;
  *     on a cluster this would be set to ~2-3x total executor cores.
  *   - UTC session timezone: deterministic timestamp semantics across
  *     engines (our DuckDB oracle runs naive/UTC).
  */
object GraftSession {

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def local(appName: String = "graft", cores: Int = defaultCores): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Fixture events.parquet carries TIMESTAMP(NANOS) which Spark has no
      // native type for; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
