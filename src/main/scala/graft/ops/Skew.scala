package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling (SURVEY §7.4.5): salted two-phase aggregation for group
  * keys whose value distribution is heavily skewed — the hand-rolled
  * complement to AQE's OptimizeSkewedJoin for the aggregation case.
  *
  * Phase 1 aggregates on (key, salt) so a hot key's rows spread over
  * `buckets` reducers; phase 2 combines the per-salt partials. Both sums
  * run in exact decimal, so the result is bit-identical to the unsalted
  * plan regardless of bucket count or cluster layout (the property the
  * test pins).
  */
object Skew {

  /** A pseudo-random-but-deterministic salt in [0, buckets): xxhash64 of
    * the whole row, so identical rows land together but a hot key's rows
    * spread. No rand() — results stay reproducible run-over-run.
    */
  def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*)), lit(buckets.toLong))

  /** count + exact-decimal sum of `valueCol` per `key`, computed via the
    * salted two-phase plan.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame =
    df.withColumn("__salt", rowSalt(df, buckets))
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
}
