package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // At bench scale every dimension side fits comfortably in memory;
      // a higher broadcast ceiling removes shuffle exchanges from the
      // join-heavy queries (AQE would get there too, but only after the
      // first shuffle materializes).
      .config("spark.sql.autoBroadcastJoinThreshold", sys.env.getOrElse("SPARK_GRAFT_BROADCAST", "64MB"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup at the smallest scale factor: compiles the generated
    // code (Janino) and JITs the hot paths so the timed pass measures the
    // engine, not first-run compilation. Falls back to the bench dir when
    // the small fixture is absent.
    val warmDir0 = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
    val warmDir = if (new java.io.File(warmDir0).isDirectory) warmDir0 else sfDir
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
