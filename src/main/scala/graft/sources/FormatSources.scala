package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** The rest of the columnar/row format matrix beyond parquet
  * ([[graft.core.Tables]]) and CSV ([[CsvSource]]): ORC and JSON-lines,
  * both schema-declared — inference is an extra full pass and
  * nondeterministic under dirty input, so it is never used here.
  *
  * ORC is the interchange format for Hive-era warehouses; at 100 TB it
  * carries the same pushdown/pruning contract as parquet (predicate
  * pushdown + column projection reach the stripe reader — the formats
  * spec pins `ReadSchema` on the scan). JSON-lines is the landing format
  * of the reference's Logstash/Beats world (one JSON object per line);
  * `columnNameOfCorruptRecord` is declared so malformed lines surface as
  * a quarantine column instead of silently dropping (PERMISSIVE) or
  * killing the batch (FAILFAST). */
object FormatSources {

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** JSON-lines with declared schema plus a `_corrupt` quarantine column:
    * rows that fail to parse land whole in `_corrupt` with nulls
    * elsewhere, so a dirty landing file degrades to a filterable column
    * instead of a job failure. The passed schema must NOT contain
    * `_corrupt`. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema must not declare _corrupt; it is added as the quarantine column")
    val withCorrupt = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(withCorrupt)
      .json(path)
  }

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
