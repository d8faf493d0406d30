// scratch audit main — not part of the library surface
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** One-off sweep: per registered query, count Generate (explode) operators
  * and repeated identical scan subtrees in the static plan — the round-14
  * repeated-token-stream pattern detector (a plan with N > 1 Generates over
  * the same source usually re-runs a corpus pass per consumer).
  */
object GenScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config(graft.Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
        val gens = "Generate".r.findAllIn(plan).size
        val scans = "Scan parquet|Scan ExistingRDD".r.findAllIn(plan).size
        if (gens >= 2) println(f"$name%-32s generates=$gens scans=$scans")
      } catch { case e: Throwable => println(s"$name SCAN FAILED: ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
