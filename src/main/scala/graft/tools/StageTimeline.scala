// scratch audit main — not part of the library surface
package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Stage-concurrency audit (guide §2.6 / VERDICT r14 item 3): run the named
  * queries once warm under the Bench session config with a listener that
  * records every stage's (submitted, completed) wall interval, then print a
  * per-query timeline plus the mean/max number of stages in flight. A query
  * whose independent subtrees (e.g. dedup_overlap_report's seven screens)
  * serialize would read max-in-flight ≈ 1; the DAG scheduler submitting all
  * ready stages of the one noop job concurrently reads ≫ 1.
  *
  * Usage: runMain graft.tools.StageTimeline <sfDir> q1 q2 ...
  */
object StageTimeline {
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
    val submitted = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val completed = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        submitted.put(e.stageInfo.stageId, System.nanoTime())
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val t1 = System.nanoTime()
        val t0 = Option(submitted.get(e.stageInfo.stageId)).getOrElse(t1)
        completed.put(e.stageInfo.stageId, (t0, t1, e.stageInfo.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def runOnce(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
    }
    names.foreach { name =>
      runOnce(name) // warm: codegen + caches + any index builds
      submitted.clear(); completed.clear()
      spark.sparkContext.setJobDescription(s"timeline: $name")
      val w0 = System.nanoTime()
      runOnce(name)
      val w1 = System.nanoTime()
      spark.sparkContext.setJobDescription(null)
      // wait for listener-bus drain so late completion events are counted
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val stages = completed.asScala.toSeq.sortBy(_._2._1)
      def ms(n: Long): Double = math.rint((n - w0) / 1e4) / 100
      println(f"== $name wall=${(w1 - w0) / 1e9}%.3f s, stages=${stages.size}")
      stages.foreach { case (id, (t0, t1, nTasks)) =>
        println(f"  stage $id%4d  [${ms(t0)}%9.2f, ${ms(t1)}%9.2f] ms  dur=${(t1 - t0) / 1e6}%8.1f ms  tasks=$nTasks")
      }
      // concurrency profile: sweep over stage intervals
      val events = stages.flatMap { case (_, (t0, t1, _)) => Seq((t0, 1), (t1, -1)) }.sortBy(_._1)
      var cur = 0; var maxC = 0
      var area = 0.0; var last = w0.toDouble; var span = 0.0
      events.foreach { case (t, d) =>
        if (cur > 0) { area += cur * (t - last); span += (t - last) }
        last = t.toDouble; cur += d; maxC = math.max(maxC, cur)
      }
      val meanC = if (span > 0) area / span else 0.0
      println(f"  max stages in flight = $maxC, mean (while any active) = $meanC%.2f")
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
