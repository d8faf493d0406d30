package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SharedSpark._

/** Bucketing (the brief's co-located-join lever): both join sides written
  * bucketed on the join key join WITHOUT a shuffle exchange — on a real
  * cluster this is the difference between moving 100 TB and moving
  * nothing. Verified on the physical plan, not assumed.
  */
class BucketingSpec extends AnyFunSuite {

  test("bucketed tables join with no shuffle exchange") {
    // spark.sql.warehouse.dir is static; tables land in the default
    // ./spark-warehouse (gitignored) and are dropped in the finally.
    val li = Tables.lineitem(spark, Sf0001).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, Sf0001).select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    try {
      // disable broadcast so the join would otherwise need a shuffle
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark
          .table("li_bucketed")
          .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString()
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n${plan.take(1200)}")
        assert(joined.count() === Tables.lineitem(spark, Sf0001).count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("SQL surface: raw spark.sql over registered views matches the DSL query") {
    graft.api.SqlSurface.registerViews(spark, Sf0001)
    val viaSql = spark
      .sql("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    val viaDsl = Tables
      .orders(spark, Sf0001)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    assert(viaSql === viaDsl)
  }
}
