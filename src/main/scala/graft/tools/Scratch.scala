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
    val sf = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // IVF recall vs brute-force ground truth (top-3 per query, qids < 10)
    val e = Tables.embeddings(spark, sf)
    val q = e.where(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val truth = q
      .crossJoin(e.select(col("vec_id").as("neighbor"), col("embedding").as("nemb")))
      .where(col("neighbor") =!= col("qid"))
      .withColumn("dot", graft.functions.VecDot.vec_dot(col("qemb"), col("nemb")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("dot").desc, col("neighbor").asc)))
      .where(col("rk") <= 3)
      .select("qid", "neighbor")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.queries.Vectors.annIvf(spark, sf)
      .select("qid", "neighbor")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"IVF recall@3 = ${truth.intersect(ivf).size.toDouble / truth.size} (pairs ivf=${ivf.size} truth=${truth.size})")
    spark.stop()
  }
}
