// scratch experiment main — not part of the library surface
package graft.tools

import graft.Tables
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

    // knn_lsh via ONE exploded (table, bucket) stream + a single self-join,
    // replacing 4 per-table self-joins + union-distinct
    def lshSingleJoin(spark: SparkSession, sf: String): DataFrame = {
      val e = Tables.embeddings(spark, sf)
      val buckets = array((0 until 4).map { t =>
        struct(
          lit(t).as("t"),
          concat((t * 4 + 1 to t * 4 + 4)
            .map(i => when(element_at(col("embedding"), i) > 0f, "1").otherwise("0")): _*).as("bkt"))
      }: _*)
      val tb = e.select(col("vec_id"), explode(buckets).as("b"))
        .select(col("vec_id"), col("b.t").as("t"), col("b.bkt").as("bkt"))
      val candidates = tb.select(col("vec_id").as("vec_a"), col("t"), col("bkt"))
        .join(tb.select(col("vec_id").as("vec_b"), col("t"), col("bkt")), Seq("t", "bkt"))
        .where(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"))
        .distinct()
      candidates
        .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
        .select(col("vec_a"), col("vec_b"),
          graft.functions.VecDot.vec_dot(col("emb_a"), col("emb_b")).as("dot"))
        .orderBy(col("dot").desc, col("vec_a").asc, col("vec_b").asc)
        .limit(20)
    }

    def time(name: String, f: => DataFrame): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }

    time("lsh_4join", graft.queries.Vectors.knnLshBucketed(spark, sf))
    time("lsh_1join", lshSingleJoin(spark, sf))
    val a = graft.queries.Vectors.knnLshBucketed(spark, sf).collect().map(_.toString).toSeq
    val b = lshSingleJoin(spark, sf).collect().map(_.toString).toSeq
    println(s"lsh equal: ${a == b}")
    spark.stop()
  }
}
