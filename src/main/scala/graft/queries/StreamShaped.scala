package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Det._

/** Batch forms of the stream-shaped aggregations (SURVEY §2.J1/J2).
  * The same logic runs as genuine Structured Streaming in
  * graft.streaming.StreamOps (ScalaTest-driven, memory sink); these batch
  * twins are the oracle-checkable registrations — streaming DataFrames
  * can't sit in `queries` because Bench calls .count().
  */
object StreamShaped {

  // ---------------------------------------------------------------- §2.J1
  /** Tumbling 1-hour windows over event time. Emits the window start. */
  def streamTumblingHourly(spark: SparkSession, sf: String): DataFrame =
    Tables
      .events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sumMoney(col("value")).as("total_value"))
      .select(col("w.start").as("hour_start"), col("n_events"), col("total_value"))
      .orderBy(col("hour_start"))

  val streamTumblingHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin

  // ---------------------------------------------------------------- §2.J2
  /** Sliding windows: 1-hour length, 15-minute slide — each event lands in
    * 4 windows. The oracle reconstructs Spark's window grid from epoch
    * arithmetic (floor to the 15-min boundary, back up 0..3 slides).
    */
  def streamSliding(spark: SparkSession, sf: String): DataFrame =
    Tables
      .events(spark, sf)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("n_events"))
      .orderBy(col("window_start"))

  val streamSlidingSql: String =
    """SELECT TIMESTAMP '1970-01-01 00:00:00'
      |    + INTERVAL 1 SECOND * ((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 - k * 900) AS window_start,
      |  COUNT(*) AS n_events
      |FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
      |GROUP BY 1 ORDER BY window_start""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("stream_tumbling_hourly", streamTumblingHourly _, streamTumblingHourlySql),
    ("stream_sliding", streamSliding _, streamSlidingSql)
  )
}
