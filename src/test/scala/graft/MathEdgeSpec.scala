package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SharedSpark._

/** Spark-side behavior of the math functions deliberately excluded from the
  * DuckDB oracle set (SURVEY §2.H5): rounding modes and libm functions.
  * These pin OUR engine's semantics; cross-engine comparison is exactly
  * what they are excluded from.
  */
class MathEdgeSpec extends AnyFunSuite {
  import spark.implicits._

  test("round is HALF_UP, bround is HALF_EVEN (documented divergence)") {
    val df = Seq(2.5, 3.5, -2.5).toDF("x")
      .select(round(col("x")).as("r"), bround(col("x")).as("b"))
      .collect()
    assert(df.map(_.getDouble(0)).toSeq === Seq(3.0, 4.0, -3.0)) // HALF_UP
    assert(df.map(_.getDouble(1)).toSeq === Seq(2.0, 4.0, -2.0)) // HALF_EVEN
  }

  test("ln/exp roundtrip within double epsilon") {
    val bad = Tables
      .customer(spark, Sf0001)
      .where(col("c_acctbal") > 0)
      .select((abs(exp(log(col("c_acctbal"))) - col("c_acctbal")) / col("c_acctbal")).as("relerr"))
      .where(col("relerr") > 1e-12)
      .count()
    assert(bad === 0)
  }

  test("ln-idf is a monotone transform of rational idf at fixed tf") {
    // tf·ln(N/df) and tf·(N/df) agree on order only within equal-tf groups
    // (ln is monotone; across tf values the orders legitimately differ —
    // which is why the oracle query uses the rational form).
    val docs = Tables.documents(spark, Sf0001)
    val tf = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy("doc_id", "token")
      .count()
      .withColumnRenamed("count", "tf")
    val df = tf.groupBy("token").count().withColumnRenamed("count", "df")
    val n = docs.count().toDouble
    val rows = tf
      .join(df, "token")
      .where(col("df") < n)
      .withColumn("idf_rational", lit(n) / col("df"))
      .withColumn("idf_ln", log(lit(n) / col("df")))
      .select("token", "idf_rational", "idf_ln")
      .distinct()
      .limit(1000)
      .collect()
    val byRational = rows.sortBy(r => (r.getDouble(1), r.getString(0))).map(_.getString(0)).toSeq
    val byLn = rows.sortBy(r => (r.getDouble(2), r.getString(0))).map(_.getString(0)).toSeq
    assert(byRational === byLn)
  }
}
