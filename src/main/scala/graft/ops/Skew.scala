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

  /** A salt in [0, buckets) from a per-row monotonic id — POSITION-based,
    * not content-based — so rows spread round-robin, including
    * EXACT-DUPLICATE rows of a hot key, the common skew shape that a
    * content-hash salt would collapse back onto one bucket. The salt is
    * layout-dependent (not stable run-over-run), which is safe here
    * precisely because phase 2 combines exact decimals: the final
    * (key, n, total) is bit-identical for ANY salt assignment — the
    * property SkewSpec pins. No rand().
    */
  def rowSalt(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** count + exact-decimal sum of `valueCol` per `key`, computed via the
    * salted two-phase plan.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame =
    df.withColumn("__salt", rowSalt(buckets))
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
}
