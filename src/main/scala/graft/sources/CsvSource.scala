package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced CSV reader (SURVEY S9 — insert_csv_to_postgres.py:53-61:
  * header row, required-column validation, date parsing). */
object CsvSource {

  /** Read with declared schema (never inferred — inference is a full extra
    * pass over the data and nondeterministic under dirty input). */
  def read(spark: SparkSession, path: String, schema: StructType,
      timestampFormat: String = "yyyy-MM-dd'T'HH:mm:ss"): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .schema(schema)
      .csv(path)

  /** Reference's column validation (insert_csv_to_postgres.py:56-60): fail
    * fast if the file lacks required columns. */
  def readValidated(spark: SparkSession, path: String, schema: StructType,
      required: Seq[String]): DataFrame = {
    val header = spark.read.option("header", "true").csv(path).schema.fieldNames.toSet
    val missing = required.filterNot(header.contains)
    require(missing.isEmpty, s"CSV $path missing required columns: ${missing.mkString(", ")}")
    read(spark, path, schema)
  }
}
