// scratch experiment main — not part of the library surface
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profile behind the round-11 DistinctNgrams attribution correction
  * (ADVICE r10): does `array_distinct` over `array<string>` scale linearly
  * or quadratically with array length in the pinned Spark 4.1.2?
  *
  * Two timed shapes, 2000 rows each, element count doubling 1k → 16k:
  *   1. `array_distinct(t)` over a pre-materialized all-distinct string
  *      array vs a size-only baseline — isolates ArrayDistinct itself;
  *   2. the query-shaped composed form
  *      `array_distinct(transform(sequence(...), i -> concat(...)))` vs
  *      the same without the distinct — isolates the interpreted-HOF term.
  * Linear scaling ⇒ the r10 speedups are attributable to removing the
  * interpreted transform() lambda + per-element Invoke, NOT a quadratic
  * ArrayDistinct (whose pairwise path applies only to types without
  * binary-equality semantics). Findings recorded in BENCH_NOTES §20.
  */
object ArrayDistinctProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): Double = { val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9 }
    println("-- bare array_distinct(t) on all-distinct string arrays --")
    for (n <- Seq(1000, 2000, 4000, 8000, 16000)) {
      val df = spark.range(2000).select(
        expr(s"transform(sequence(1, $n), i -> concat('tok_', cast(id as string), '_', cast(i as string)))").as("t"))
        .localCheckpoint()
      val ad = () => df.select(sum(size(array_distinct(col("t"))))).head()
      val base = () => df.select(sum(size(col("t")))).head()
      ad(); base()
      val tAd = (1 to 3).map(_ => time(ad())).min
      val tBase = (1 to 3).map(_ => time(base())).min
      println(f"n=$n%6d  array_distinct=$tAd%.3f s  size_only=$tBase%.3f s  delta=${tAd - tBase}%.3f")
    }
    println("-- composed array_distinct(transform(...)) vs transform alone --")
    for (n <- Seq(1000, 2000, 4000, 8000)) {
      val df = spark.range(2000).select(
        expr(s"transform(sequence(1, $n), i -> concat('tok_', cast(id as string), '_', cast(i as string)))").as("t"))
        .localCheckpoint()
      val comp = () => df.select(sum(size(expr(
        "array_distinct(transform(sequence(1, size(t)-1), i -> concat(element_at(t,i),' ',element_at(t,i+1))))")))).head()
      val tr = () => df.select(sum(size(expr(
        "transform(sequence(1, size(t)-1), i -> concat(element_at(t,i),' ',element_at(t,i+1)))")))).head()
      comp(); tr()
      val tComp = (1 to 3).map(_ => time(comp())).min
      val tTr = (1 to 3).map(_ => time(tr())).min
      println(f"n=$n%6d  composed=$tComp%.3f s  transform_only=$tTr%.3f s  distinct_delta=${tComp - tTr}%.3f")
    }
    spark.stop()
  }
}
