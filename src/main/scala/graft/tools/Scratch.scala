// scratch experiment main — not part of the library surface
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Ad-hoc micro-benchmarks for plan experiments; edited freely between
  * rounds, never referenced by the library or tests.
  *
  * Current contents: stage-level attribution for a single query — runs the
  * query once warm, then once instrumented, printing every completed
  * stage's wall time, task count, and name so multi-second queries can be
  * attributed to NAMED stages instead of guessed at.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "8MB")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config(graft.queries.Det.SpreadConf, "true")
      .config(graft.Tables.EventsNanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach { n =>
      val df = graft.Tables.table(spark, sf, n)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
    }

    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, String)]
    @volatile var collect = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collect) {
        val info = sc.stageInfo
        val dur = (for {s <- info.submissionTime; c <- info.completionTime} yield c - s).getOrElse(-1L)
        val m = info.taskMetrics
        val io = s"srR=${m.shuffleReadMetrics.recordsRead} swR=${m.shuffleWriteMetrics.recordsWritten} " +
          s"out=${m.outputMetrics.recordsWritten} cpuMs=${m.executorCpuTime / 1000000}"
        stages += ((info.stageId, dur, info.numTasks, io + "  " + info.name.linesIterator.next().take(80)))
      }
    })

    // "ALL" sweeps every registered query in one JVM (streaming-shaped
    // entries included — they all register batch-runnable DataFrames);
    // comma-separated names run a subset. Per-query stage tables print in
    // sequence for the double-exec detector to parse.
    val names: Seq[String] =
      if (name == "ALL") graft.SparkEntry.queries.keys.toSeq.sorted
      else name.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { q =>
      stages.clear()
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sf).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("true"))
        println(graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString())
      run(); run() // warm
      collect = true
      val wall = run()
      collect = false
      Thread.sleep(300) // let the listener bus drain
      println(f"== $q wall $wall%.3f s, ${stages.size} stages, ${stages.map(_._2).sum / 1e3}%.3f s total stage time")
      stages.sortBy(-_._2).take(30).foreach { case (id, dur, nt, nm) =>
        println(f"stage $id%4d ${dur / 1e3}%8.3f s $nt%4d tasks  $nm")
      }
    }
    spark.stop()
  }
}
