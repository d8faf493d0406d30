// scratch experiment main — not part of the library surface
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-count A/B behind the round-11 large-star/small-star close: runs
  * both CC forms over the real minhash candidate-pair graph at a given sf
  * dir and prints (rounds, wall seconds) each. The label loop's round
  * count tracks component diameter (measured: 12 at sf1); the star
  * alternation's tracks log(diameter). Numbers recorded in BENCH_NOTES §21
  * and the [[graft.queries.TextOps.starsCc]] scaladoc.
  */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextOps
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"))
    val pairs = TextOps.minhashCandidatePairs(spark, sf)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    println(s"pairs=${pairs.count()}")

    // stars: rounds come back directly
    var t0 = System.nanoTime
    val (starLabels, starRounds) = TextOps.starsCc(docs, pairs)
    val starN = starLabels.count()
    println(f"stars:    rounds=$starRounds  wall=${(System.nanoTime - t0) / 1e9}%.2f s")

    // label fixpoint: replicate the loop with a counter (the library API
    // deliberately doesn't expose rounds)
    t0 = System.nanoTime
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .unionByName(docs.select(col("doc_id").as("src"), col("doc_id").as("dst")))
      .localCheckpoint()
    var labels = docs.select(col("doc_id").as("v"), col("doc_id").as("lbl")).localCheckpoint()
    def labelSum(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
    var prev = labelSum(labels)
    var rounds = 0
    var changed = true
    while (changed && rounds < 100) {
      rounds += 1
      val next = edges.join(labels, col("src") === col("v"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("lbl"))
        .select(col("dst").as("v"), col("lbl")).localCheckpoint()
      val s = labelSum(next)
      changed = s.compareTo(prev) != 0
      prev = s
      labels = next
    }
    println(f"labels:   rounds=$rounds  wall=${(System.nanoTime - t0) / 1e9}%.2f s")

    // cross-check the two label tables agree
    val diff = starLabels
      .withColumnRenamed("cluster_id", "a")
      .join(labels.select(col("v").as("doc_id"), col("lbl").as("b")), Seq("doc_id"))
      .where(col("a") =!= col("b")).count()
    println(s"label mismatches=$diff of $starN")
    spark.stop()
  }
}
