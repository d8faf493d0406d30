// scratch experiment main — not part of the library surface
package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc micro-benchmarks for plan experiments; edited freely between
  * rounds, never referenced by the library or tests.
  *
  * Round-8 contents: an in-JVM CONFIG-MATRIX A/B over the BASELINE.md
  * headline suite. Single-run A/Bs on this host carry ±15% noise, so the
  * matrix interleaves configs across rounds (every config sees the same
  * host transients) and reports the per-(config, query) minimum — the
  * same least-noise estimator Bench uses. AQE and shuffle-partition count
  * are RUNTIME-settable confs, so one JVM serves every cell.
  */
object Scratch {
  private val headline = Seq(
    "q1_pricing_summary", "q3_join_topk", "q5_multijoin", "window_rank",
    "distinct_users_daily", "sessionize", "json_extract_agg",
    "dedup_docs_exact", "knn_brute_force", "setop_except")

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config(graft.queries.Det.SpreadConf, "true")
      .config(graft.Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach { n =>
      val df = graft.Tables.table(spark, sf, n)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
    }
    val configs: Seq[(String, () => Unit)] = Seq(
      ("bc=64MB", () => { spark.conf.set("spark.sql.adaptive.enabled", "false"); spark.conf.set("spark.sql.shuffle.partitions", "8"); spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB") }),
      ("bc=8MB", () => { spark.conf.set("spark.sql.adaptive.enabled", "false"); spark.conf.set("spark.sql.shuffle.partitions", "8"); spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "8MB") }),
      ("bc=1MB", () => { spark.conf.set("spark.sql.adaptive.enabled", "false"); spark.conf.set("spark.sql.shuffle.partitions", "8"); spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB") }),
      ("bc=1MB,hash", () => { spark.conf.set("spark.sql.adaptive.enabled", "false"); spark.conf.set("spark.sql.shuffle.partitions", "8"); spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB"); spark.conf.set("spark.sql.join.preferSortMergeJoin", "false") }))
    val queries = if (args.nonEmpty) args.toSeq else headline
    def runOnce(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup every (config, query) cell once
    configs.foreach { case (_, set) => set(); queries.foreach(runOnce) }
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (_ <- 1 to 4; (cname, set) <- configs) {
      set()
      queries.foreach { q =>
        val t = runOnce(q)
        best((cname, q)) = math.min(best.getOrElse((cname, q), Double.MaxValue), t)
      }
    }
    println(f"${"query"}%-22s " + configs.map(_._1).map(c => f"$c%12s").mkString)
    queries.foreach { q =>
      println(f"$q%-22s " + configs.map(c => f"${best((c._1, q))}%12.3f").mkString)
    }
    println(f"${"TOTAL"}%-22s " + configs.map(c =>
      f"${queries.map(q => best((c._1, q))).sum}%12.3f").mkString)
    spark.stop()
  }
}
