package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Sources / sinks (SURVEY §2.A): the ingest surface of the reference
  * pipeline relationalized. The reference maintained a ~56-row "source
  * table" (state code → page name → url → flags) loaded from a
  * Google-Sheets CSV export or JSON config; these loaders are that
  * semantic with explicit schemas (never runtime inference — SURVEY §1.1)
  * so downstream plans are type-stable.
  *
  * No CSV/JSON fixtures ship in /root/testdata, so these are exercised by
  * SourcesSpec on generated temp files (SURVEY §2.A: "ScalaTest; no CSV in
  * testdata").
  */
object Sources {

  /** The reference's url-source table shape [R:url_source.py ~med]. */
  val sourceTableSchema: StructType = StructType(Seq(
    StructField("state", StringType, nullable = false),
    StructField("page", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("active", BooleanType, nullable = true)))

  /** A2 — CSV ingest with explicit schema (header row skipped). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** A3 — JSON-lines ingest with explicit schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** A4 — raw text ingest (one row per line, column `value`). */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** A4 — whole-file binary ingest (path, modificationTime, length,
    * content) — the raw-HTML page-capture shape.
    */
  def readBinary(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** A6 — partitioned parquet sink: the stage/state directory layout of
    * the reference's directory cache. Partition values become directory
    * keys, giving free partition pruning on read.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** A5′ — JSON-lines report sink: the reference persisted each run's
    * change-list report as JSON [R:change_list.py ~med].
    * `singleFile = true` (default, matching the reference's one-report-file
    * shape) coalesces to one task — use ONLY for small report frames; pass
    * false for a distributed one-file-per-partition write of large frames.
    */
  def writeJsonReport(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df).write.mode("overwrite").json(path)

  /** A5′ — CSV report sink with header (the Sheets-export round-trip);
    * `singleFile` semantics as in [[writeJsonReport]]. */
  def writeCsvReport(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    (if (singleFile) df.coalesce(1) else df).write.mode("overwrite").option("header", "true").csv(path)

  /** A5″ — ORC sink + source: Spark's second built-in columnar format, for
    * interchange with ORC-native warehouses. Same predicate-pushdown /
    * column-pruning surface as parquet (SourcesSpec pins the round-trip
    * and the pushed filter).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
