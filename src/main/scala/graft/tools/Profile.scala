// scratch profiling main — not part of the library
package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("agg_groupby")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // default matches Bench so profiled plans correspond to bench plans
      .config("spark.sql.autoBroadcastJoinThreshold", sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "8MB"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_MAXPART", "128MB"))
      .config(graft.queries.Det.SpreadConf, sys.env.getOrElse("SPARK_GRAFT_SPREAD", "true"))
      .config(graft.Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same timed action as Bench, resolved through the SHARED whitelist
    // (ADVICE r7: Profile used to map unknown values to toRdd.count()
    // while Bench mapped them to the noop write — a typo silently A/B'd
    // different actions between harnesses).
    val action = graft.BenchAction.resolve()
    names.foreach { name =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        graft.BenchAction.run(action, df)
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      if (sys.env.contains("PROFILE_EXPLAIN"))
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
