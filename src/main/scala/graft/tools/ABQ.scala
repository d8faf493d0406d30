// scratch A/B main — not part of the library
package graft.tools

import graft.Tables
import graft.queries.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B: q3/q5 as registered vs with the lineitem
  * probe side spread across cores (the FloorTrace decomposition shows
  * q3's cost is a single-task 600k-row double-broadcast probe).
  */
object ABQ {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "7").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.adaptive.enabled", "true")
      .config(Det.SpreadConf, "true")
      .config(Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { n =>
      val df = Tables.table(spark, sf, n)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY); df.count()
    }
    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def q3(li: DataFrame): DataFrame =
      Tables.customer(spark, sf)
        .where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
        .where(col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .where(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    def li0 = Tables.lineitem(spark, sf)
    def li1 = Det.spreadSmallScan(spark, Tables.lineitem(spark, sf))
    // pre-filter+project before spread: shuffle only the 4 needed columns
    def li2 = Det.spreadSmallScan(spark,
      Tables.lineitem(spark, sf)
        .where(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"), col("l_shipdate")))
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
    }
    time(q3(li0)); time(q3(li1)); time(q3(li2)) // warm
    val s = (1 to iters).map(_ => (time(q3(li0)), time(q3(li1)), time(q3(li2))))
    println(f"""{"q3_registered":${s.map(_._1).min}%.3f,"q3_spread":${s.map(_._2).min}%.3f,"q3_spread_slim":${s.map(_._3).min}%.3f}""")
    spark.stop()
  }
}
