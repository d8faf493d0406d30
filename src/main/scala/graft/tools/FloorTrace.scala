// scratch profiling main — not part of the library
package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Floor decomposition for the BASELINE.md headline suite (VERDICT r5 item
  * 2's "profiler-trace appendix" path): attribute each query's floor to
  * NAMED engine phases, measured, not estimated.
  *
  * Phase sources:
  *   - Catalyst phases (analysis / optimization / planning) from
  *     `QueryExecution.tracker.phases` — per-query driver-side cost of
  *     planning a FRESH DataFrame, paid on every bench iteration exactly
  *     as a CLI user pays it per statement.
  *   - `execution` wall time from a QueryExecutionListener (first job
  *     submit → result), i.e. scheduler + tasks + AQE re-planning rounds.
  *   - Harness floors measured independently: `job_floor` (empty-plan
  *     count — pure job machinery), `task_floor` (32-partition no-op RDD
  *     job — per-task scheduling), `scan_floor` per table (cached-scan
  *     count).
  *
  * Emits one JSON line per query (min over ITERS runs of each component)
  * for docs/BENCH_NOTES.md's appendix.
  */
object FloorTrace {
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
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "8MB"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config(graft.queries.Det.SpreadConf, "true")
      .config(Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Execution wall time via listener (covers job scheduling + tasks +
    // AQE rounds; excludes Catalyst phases, which the tracker reports).
    @volatile var lastExecNs = 0L
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        lastExecNs = durationNs
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

    val cacheTables = sys.env.getOrElse("SPARK_GRAFT_CACHE", "true").toBoolean
    if (cacheTables) Tables.names.foreach { n =>
      val df = Tables.table(spark, sfDir, n)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
    }

    def minOf(runs: Seq[Double]): Double = math.rint(runs.min * 10000) / 10000

    // Harness floors.
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(_ => spark.range(1).count()) // warm
    val jobFloor = minOf((1 to iters).map(_ => timed(spark.range(1).count())))
    val taskFloor = minOf((1 to iters).map(_ =>
      timed(spark.sparkContext.parallelize(1 to cpus.toInt, cpus.toInt).count())))
    val scanFloors = Tables.names.map { n =>
      val df = Tables.table(spark, sfDir, n)
      (1 to 2).foreach(_ => df.count())
      n -> minOf((1 to iters).map(_ => timed(df.count())))
    }
    println(s"""{"harness":{"job_floor":$jobFloor,"task_floor_32":$taskFloor,"scan_floors":{${
      scanFloors.map { case (n, t) => s""""$n":$t""" }.mkString(",")}}}}""")

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach(_ => fn(spark, sfDir).write.mode("overwrite").format("noop").save()) // warm
      // noop wall: the bench's own action, for the "what Bench sees" column
      val noopWall = minOf((1 to iters).map(_ =>
        timed(fn(spark, sfDir).write.mode("overwrite").format("noop").save())))
      val comps = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        // The same global-agg plan Dataset.count() builds, executed
        // directly so analysis/optimization/planning/execution all land on
        // ONE QueryExecution's tracker.
        val cnt = df.groupBy().count()
        val qe = cnt.queryExecution
        cnt.collect()
        val wall = (System.nanoTime() - t0) / 1e9
        val phases = qe.tracker.phases.map { case (p, s) =>
          p -> (s.endTimeMs - s.startTimeMs) / 1e3
        }
        (wall,
          phases.getOrElse("analysis", 0.0),
          phases.getOrElse("optimization", 0.0),
          phases.getOrElse("planning", 0.0),
          lastExecNs / 1e9)
      }
      val wall = minOf(comps.map(_._1))
      val ana = minOf(comps.map(_._2))
      val opt = minOf(comps.map(_._3))
      val plan = minOf(comps.map(_._4))
      val exec = minOf(comps.map(_._5))
      val catalyst = math.rint((ana + opt + plan) * 10000) / 10000
      val other = math.rint((wall - catalyst - exec) * 10000) / 10000
      println(s"""{"query":"$name","noop_wall":$noopWall,"count_wall":$wall,"analysis":$ana,"optimization":$opt,"planning":$plan,"execution":$exec,"catalyst_total":$catalyst,"residual_driver":$other}""")
    }
    spark.stop()
  }
}
