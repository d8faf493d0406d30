// scratch audit main — not part of the library surface
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Split each query's warm wall into DRIVER PLANNING vs EXECUTION (guide
  * §7.3: very large plans can make planning itself the bottleneck — the
  * round-15 stage timeline showed dedup_overlap_report's first stage
  * starting ~4 s into a warm 12.7 s run). Per query, over N warm
  * iterations: t_plan = builder fn + analysis + optimization + physical
  * planning (forcing queryExecution.executedPlan), t_exec = the noop write
  * on the ALREADY-planned frame. Bench session config, cached tables.
  *
  * Usage: runMain graft.tools.PlanCost <sfDir> q1 q2 ...
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "8MB"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config(graft.queries.Det.SpreadConf, sys.env.getOrElse("SPARK_GRAFT_SPREAD", "true"))
      .config(graft.Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.getOrElse("SPARK_GRAFT_CACHE", "true").toBoolean)
      graft.Tables.names.foreach { n =>
        val df = graft.Tables.table(spark, sfDir, n)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        df.count()
      }
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    names.foreach { name =>
      // warm both paths once
      val warm = SparkEntry.queries(name)(spark, sfDir)
      warm.write.format("noop").mode("overwrite").save()
      val rows = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // forces analysis->physical planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val plan = rows.map(_._1).min
      val exec = rows.map(_._2).min
      println(f"$name%-36s plan_s=$plan%7.3f exec_s=$exec%7.3f plan_share=${plan / (plan + exec) * 100}%5.1f%%")
    }
    // per-Catalyst-rule cumulative time across everything above (set
    // SPARK_GRAFT_RULES=true and pass ONE query for a per-query read)
    if (sys.env.contains("SPARK_GRAFT_RULES")) {
      val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      println(dump.split('\n').take(40).mkString("\n"))
    }
    spark.stop()
  }
}
