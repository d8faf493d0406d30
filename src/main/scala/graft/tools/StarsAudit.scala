// scratch audit main — not part of the library surface
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-iteration audit of the large-star/small-star CC loop (VERDICT r14
  * item 6): replicate graft.queries.TextOps.starsCc round by round under
  * the Bench session config and report, per round, wall seconds, jobs,
  * stages, and the exchange shape of the round's `next` plan — does the
  * `large` subtree (join + filter + distinct over the symmetric edge set)
  * execute once or twice inside the round's checkpoint job?
  *
  * Usage: runMain graft.tools.StarsAudit <sfDir>
  */
object StarsAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
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
        val df = graft.Tables.table(spark, sf, n)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        df.count()
      }
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })
    import graft.queries.TextOps
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"))
    val t00 = System.nanoTime()
    val pairs0 = TextOps.minhashCandidatePairs(spark, sf).select(col("doc_a"), col("doc_b"))

    def oriented(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    var edges = oriented(
      pairs0.select(col("doc_a").as("u"), col("doc_b").as("v"))).localCheckpoint()
    var nEdges = edges.count()
    println(f"setup (pairs+orient+count): ${(System.nanoTime() - t00) / 1e9}%.3f s  edges=$nEdges  jobs=${jobs.get}  stages=${stages.get}")
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged && rounds < 50) {
      rounds += 1
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val variant = sys.env.getOrElse("STARS_VARIANT", "base")
      val sym0 = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val sym = if (variant == "repart") sym0.repartition(col("u")) else sym0
      val mLarge = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val large0 = sym.join(mLarge, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      val large = variant match {
        case "checkpoint" => large0.localCheckpoint()
        case "repart"     => large0.repartition(col("u"))
        case _            => large0
      }
      val mSmall = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = large.join(mSmall, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mSmall.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
      if (rounds == 1) {
        val p = next.queryExecution.executedPlan.toString()
        val ex = "Exchange".r.findAllIn(p).size
        val rex = "ReusedExchange".r.findAllIn(p).size
        val smj = "SortMergeJoin".r.findAllIn(p).size
        val agg = "HashAggregate".r.findAllIn(p).size
        println(s"round-1 next plan: Exchange=$ex (ReusedExchange=$rex) SortMergeJoin=$smj HashAggregate=$agg")
      }
      val nextC = next.localCheckpoint()
      val tCk = System.nanoTime()
      val nNext = nextC.count()
      val tCnt = System.nanoTime()
      converged = nNext == nEdges &&
        nextC.unionByName(edges).distinct().count() == nNext
      val t1 = System.nanoTime()
      println(f"round $rounds: total=${(t1 - t0) / 1e9}%.3f s (checkpoint=${(tCk - t0) / 1e9}%.3f, count=${(tCnt - tCk) / 1e9}%.3f, conv=${(t1 - tCnt) / 1e9}%.3f)  edges=$nNext  jobs=${jobs.get}  stages=${stages.get}")
      edges = nextC
      nEdges = nNext
    }
    println(f"stars total: ${(System.nanoTime() - t00) / 1e9}%.3f s, rounds=$rounds")
    spark.stop()
  }
}
