package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew
import SharedSpark._

class SkewSpec extends AnyFunSuite {

  test("salted two-phase aggregation is bit-identical to the direct plan") {
    // events grouped by event_type: 5 hot keys over 1000 rows — the skew shape
    val ev = Tables.events(spark, Sf0001)
    val direct = ev
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    Seq(4, 16, 64).foreach { buckets =>
      val salted = Skew
        .saltedCountSum(ev, "event_type", "value", buckets)
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
        .toMap
      assert(salted === direct, s"buckets=$buckets")
    }
  }

  test("salt actually spreads a hot key over the requested buckets") {
    val ev = Tables.events(spark, Sf0001)
    val spread = ev
      .withColumn("__salt", Skew.contentSalt(16, ev.columns.map(col).toSeq: _*))
      .where(col("event_type") === "view")
      .select(countDistinct(col("__salt")))
      .head()
      .getLong(0)
    assert(spread >= 12, s"only $spread of 16 salt buckets used")
  }

  test("documented caveat: byte-identical rows collapse to one bucket (correct, unspread)") {
    // This pins the honest boundary in Skew's scaladoc: a content salt
    // cannot spread rows that are identical in every hashed column — the
    // aggregate stays CORRECT (phase 2 merges exact decimals) but that
    // key degrades to the unsalted single-reducer shape. If this test
    // starts failing because spread appeared, the salt gained a
    // nondeterministic input — which would be the retry-safety bug.
    import spark.implicits._
    val dupes = Seq.fill(500)(("hot", 1.0)).toDF("k", "value")
    val spread = dupes
      .withColumn("__salt", Skew.contentSalt(16, dupes.columns.map(col).toSeq: _*))
      .select(countDistinct(col("__salt")))
      .head().getLong(0)
    assert(spread === 1L)
    val out = Skew.saltedCountSum(dupes, "k", "value", 16).collect()
    assert(out.length === 1 && out.head.getLong(1) === 500L && out.head.getDouble(2) === 500.0)
  }

  test("salt is deterministic across recomputation (retry safety)") {
    // The same row must land in the same bucket on every evaluation — the
    // property a monotonically_increasing_id / rand salt lacks (a retried
    // map task would re-salt rows inconsistently with surviving output).
    val ev = Tables.events(spark, Sf0001)
    val salted = ev.withColumn(
      "__salt", Skew.contentSalt(16, ev.columns.map(col).toSeq: _*))
    val a = salted.select(col("event_id"), col("__salt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = salted.select(col("event_id"), col("__salt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
  }
}
