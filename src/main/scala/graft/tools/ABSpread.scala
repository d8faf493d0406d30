// scratch A/B main — not part of the library
package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Same-JVM interleaved A/B of the cached-spread table path vs the raw
  * parquet path (host drift cancels: each pair of samples is seconds
  * apart). Det.SpreadConf is read at PLAN BUILD time, so toggling the conf
  * flips every query between the 32-partition InMemoryRelation (conf on —
  * plans canonically match the cached spread plan) and the single-row-group
  * FileScan (conf off — no cache match, by design).
  */
object ABSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq(
        "q1_pricing_summary", "q3_join_topk", "q5_multijoin", "window_rank",
        "distinct_users_daily", "sessionize", "json_extract_agg",
        "dedup_docs_exact", "knn_brute_force", "setop_except")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.queries.Det.SpreadConf, "true")
      .config(Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { n =>
      val df = Tables.table(spark, sfDir, n)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
    }
    def time(name: String, spread: Boolean): Double = {
      spark.conf.set(graft.queries.Det.SpreadConf, spread.toString)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    var sumOn = 0.0; var sumOff = 0.0
    names.foreach { name =>
      // warm both paths
      time(name, spread = true); time(name, spread = false)
      val pairs = (1 to iters).map(_ => (time(name, spread = true), time(name, spread = false)))
      val on = pairs.map(_._1).min; val off = pairs.map(_._2).min
      sumOn += on; sumOff += off
      println(f"""{"query":"$name","cached_spread":$on%.3f,"raw_parquet":$off%.3f}""")
    }
    println(f"""{"total_cached_spread":$sumOn%.3f,"total_raw_parquet":$sumOff%.3f}""")
    spark.stop()
  }
}
