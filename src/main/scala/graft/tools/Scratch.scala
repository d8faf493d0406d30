// scratch experiment main — not part of the library surface
package graft.tools

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc micro-benchmarks for plan experiments; edited freely between
  * rounds, never referenced by the library or tests.
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

    val cap = graft.queries.TextOps.JaccardDfCap

    // window-df variant of the capped jaccard: df and n_bg both computed as
    // windows in ONE pipeline over the distinct bigram stream, so every
    // consumer (both self-join sides + the hot-set branch) shares the same
    // subtree instead of re-deriving it through differently-pruned branches
    def jaccardW(spark: SparkSession, sf: String): DataFrame = {
      val b2 = Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), col("source"),
          split(lower(col("text")), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(col("doc_id"), col("lang"), col("source"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
          .as("bg"))
        .distinct()
        .withColumn("n_bg", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("lang"), col("source"), col("bg"))))
      val rare = b2.where(col("df") <= cap)
      val pairs = rare
        .select(col("doc_id").as("doc_a"), col("n_bg").as("n_a"), col("lang"), col("source"), col("bg"))
        .join(
          rare.select(col("doc_id").as("doc_b"), col("n_bg").as("n_b"), col("lang"), col("source"), col("bg")),
          Seq("lang", "source", "bg"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("n_shared_rare"))
      val hotSets = b2.where(col("df") > cap)
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_set(col("bg"))).as("hot_bgs"))
      val emptyArr = array().cast("array<string>")
      pairs
        .join(hotSets.select(col("doc_id").as("doc_a"), col("hot_bgs").as("hot_a")), Seq("doc_a"), "left")
        .join(hotSets.select(col("doc_id").as("doc_b"), col("hot_bgs").as("hot_b")), Seq("doc_b"), "left")
        .withColumn(
          "n_shared",
          col("n_shared_rare") +
            size(array_intersect(coalesce(col("hot_a"), emptyArr), coalesce(col("hot_b"), emptyArr))).cast("long"))
        .withColumn(
          "jaccard",
          col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
        .where(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("n_shared"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }

    def time(name: String, f: => DataFrame): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }

    time("jaccard_joinback", graft.queries.TextOps.dedupNgramJaccard(spark, sf))
    time("jaccard_windowdf", jaccardW(spark, sf))
    time("ann_ivf_ckpt", graft.queries.Vectors.annIvf(spark, sf))

    val a = graft.queries.TextOps.dedupNgramJaccard(spark, sf).collect().map(_.toString).toSeq
    val b = jaccardW(spark, sf).collect().map(_.toString).toSeq
    println(s"jaccard equal: ${a == b}")
    spark.stop()
  }
}
