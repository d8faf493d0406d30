// scratch experiment main — not part of the library surface
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc micro-benchmarks for plan experiments; edited freely between
  * rounds, never referenced by the library or tests. Current contents: a
  * neutral timing harness over registered queries (pass names as args) —
  * the round-3 A/B variants (q3 pre-agg, q5 projected broadcasts, jaccard
  * window-df / spread, single-join LSH) landed or were rejected and their
  * numbers are recorded in docs/BENCH_NOTES.md; the rejected variants were
  * deleted here once measured so this file can never silently compare a
  * landed plan against itself.
  *
  * Session-3 note: the harness materializes via the noop sink, matching
  * Bench. A count()-based timing here mis-attributed quality_calibration
  * as 8× its sibling — count() had pruned the sibling's entire projection
  * (the finding that motivated Bench's action change; BENCH_NOTES).
  */
object Scratch {
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

    val action = sys.env.getOrElse("SPARK_GRAFT_ACTION", "noop")
    def time(name: String, f: => DataFrame): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        if (action == "count") f.count()
        else f.write.mode("overwrite").format("noop").save()
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    names.foreach(n => time(n, graft.SparkEntry.queries(n)(spark, sf)))
    spark.stop()
  }
}
