package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL API surface: registers every test table as a temp view so users can
  * drive the engine with `spark.sql(...)` instead of the DataFrame DSL —
  * both surfaces build the same Catalyst plans, so everything the query
  * registry guarantees (pushdown, pruning, broadcast selection) holds for
  * raw SQL too.
  */
object SqlSurface {

  /** Register all tables of a scale-factor directory as temp views. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { name =>
      Tables.table(spark, sfDir, name).createOrReplaceTempView(name)
    }

  /** Convenience: register then run one SQL statement. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(query)
  }
}
