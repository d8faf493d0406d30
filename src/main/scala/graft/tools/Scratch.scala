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

    // registered jaccard but with the documents scan spread across cores
    // BEFORE the explode (the Generate currently runs in ONE task — the
    // scan is a single row group — and only the distinct's shuffle spreads)
    def jaccardSpread(spark: SparkSession, sf: String): DataFrame = {
      val bigrams = graft.queries.Det
        .spreadSmallScan(spark, Tables.documents(spark, sf))
        .select(col("doc_id"), col("lang"), col("source"),
          split(lower(col("text")), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(col("doc_id"), col("lang"), col("source"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
          .as("bg"))
        .distinct()
        .withColumn("n_bg", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      val hotBgs = bigrams
        .groupBy(col("lang"), col("source"), col("bg"))
        .agg(count(lit(1)).as("df"))
        .where(col("df") > cap)
        .select(col("lang"), col("source"), col("bg"))
      val rare = bigrams.join(hotBgs, Seq("lang", "source", "bg"), "left_anti")
      val pairs = rare
        .select(col("doc_id").as("doc_a"), col("n_bg").as("n_a"), col("lang"), col("source"), col("bg"))
        .join(
          rare.select(col("doc_id").as("doc_b"), col("n_bg").as("n_b"), col("lang"), col("source"), col("bg")),
          Seq("lang", "source", "bg"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("n_shared_rare"))
      val hotSets = bigrams.join(hotBgs, Seq("lang", "source", "bg"), "left_semi")
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

    // registered contamination but with the shingle source spread
    def contaminationSpread(spark: SparkSession, sf: String): DataFrame = {
      val shingles = graft.queries.Det
        .spreadSmallScan(spark, Tables.documents(spark, sf))
        .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
        .where(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(1, size(t) - 2), i -> concat(element_at(t, i), ' ', element_at(t, i + 1), ' ', element_at(t, i + 2))))"))
          .as("sh"))
      val bench = shingles.where(col("doc_id") < 20).select(col("doc_id").as("bench_doc"), col("sh"))
      val train = shingles.where(col("doc_id") >= 20).select(col("doc_id").as("train_doc"), col("sh"))
      train
        .join(broadcast(bench), Seq("sh"))
        .groupBy(col("train_doc"), col("bench_doc"))
        .agg(count(lit(1)).as("n_shared_shingles"))
        .where(col("n_shared_shingles") >= 3)
        .orderBy(col("n_shared_shingles").desc, col("train_doc"), col("bench_doc"))
    }

    def time(name: String, f: => DataFrame): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }

    time("jaccard_nospread", graft.queries.TextOps.dedupNgramJaccard(spark, sf))
    time("jaccard_spread  ", jaccardSpread(spark, sf))
    time("contam_nospread ", graft.queries.Corpus.contaminationCheck(spark, sf))
    time("contam_spread   ", contaminationSpread(spark, sf))

    val a = graft.queries.TextOps.dedupNgramJaccard(spark, sf).collect().map(_.toString).toSeq
    val b = jaccardSpread(spark, sf).collect().map(_.toString).toSeq
    println(s"jaccard equal: ${a == b}")
    spark.stop()
  }
}
