// scratch experiment main — not part of the library surface
package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off derivation of [[graft.queries.Refinery.BpeMerges]]: prints the
  * k=12 merge table bpeLearnMerges produces from a given sf dir (the
  * committed constant comes from sf0.001; RefinerySpec re-derives it).
  */
object BpeLearnProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val merges = graft.queries.Refinery.bpeLearnMerges(graft.Tables.documents(spark, sf), k)
    merges.foreach { case (a, b) => println(s"""("$a", "$b"),""") }
    spark.stop()
  }
}
