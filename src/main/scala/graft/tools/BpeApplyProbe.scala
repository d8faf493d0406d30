// scratch experiment main — not part of the library surface
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does bpeEncode's time go as the merge-rank count
  * grows? Times analysis (queryExecution.executedPlan forced) and
  * execution separately for k = 1..12 prefixes of BpeMerges.
  */
object BpeApplyProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Refinery
    val docs = graft.Tables.documents(spark, sf)
    for (k <- Seq(1, 2, 4, 6, 8, 12)) {
      val wf = docs.select(explode(split(lower(col("text")), " ")).as("w"))
        .where(col("w") =!= "").groupBy(col("w")).agg(count(lit(1)).as("wn"))
      val seg0 = wf.withColumn("s",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      val segmented = Refinery.BpeMerges.take(k).foldLeft(seg0) { case (df, (a, b)) =>
        df.withColumn("s", Refinery.mergePairFold(col("s"), a, b))
      }
      val q = segmented.select(col("wn"), explode(col("s")).as("symbol"))
        .groupBy(col("symbol")).agg(sum(col("wn")).as("n"))
        .orderBy(col("n").desc, col("symbol").asc).limit(100)
      var t0 = System.nanoTime
      val plan = q.queryExecution.executedPlan
      val tAnalyze = (System.nanoTime - t0) / 1e9
      t0 = System.nanoTime
      val n = q.collect().length
      val tExec = (System.nanoTime - t0) / 1e9
      println(f"k=$k%2d  analyze=$tAnalyze%8.2f s  exec=$tExec%8.2f s  rows=$n  planSize=${plan.toString.length}")
    }
    spark.stop()
  }
}
