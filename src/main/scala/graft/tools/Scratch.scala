// scratch experiment main — not part of the library surface
package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Ad-hoc micro-benchmarks for plan experiments; edited freely between
  * rounds, never referenced by the library or tests.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }

    val li = Tables.lineitem(spark, sf)
    time("scan_count")(li.count())
    time("scan_filter_project") {
      li.where(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")).count()
    }
    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    time("agg_decimal_sum") {
      li.groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))).as("rev"))
        .count()
    }
    time("agg_double_sum") {
      li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        .count()
    }
    val cust = Tables.customer(spark, sf).where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sf).where(col("o_orderdate") < lit("1999-01-01").cast("timestamp_ntz"))
    time("join_only") {
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li.where(col("l_shipdate") > lit("1996-01-01").cast("timestamp_ntz")),
          col("o_orderkey") === col("l_orderkey"))
        .count()
    }
    time("li_repartitioned_agg_decimal") {
      li.repartition(32)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount")))).as("rev"))
        .count()
    }
    spark.stop()
  }
}
