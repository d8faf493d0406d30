package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EventAnalytics
import SharedSpark._

/** Invariant tests for the round-5 event-analytics operators (sf0.001). */
class EventAnalyticsSpec extends AnyFunSuite {

  test("window_rolling_range: counts match a local interval recompute; frame is order-insensitive") {
    val events = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"),
        unix_seconds(col("ts").cast("timestamp")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = events.groupBy(_._2)
    val got = EventAnalytics.windowRollingRange(spark, Sf0001).collect()
    assert(got.length === events.length)
    got.foreach { r =>
      val (eventId, userId, sec, n1h) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val want = byUser(userId).count { case (_, _, s) => s >= sec - 3599 && s <= sec }
      assert(n1h === want.toLong, s"event $eventId")
    }
  }

  test("funnel_stages: conserves users, shares normalize, stages only deepen with evidence") {
    val rows = EventAnalytics.funnelStages(spark, Sf0001).collect()
    val nUsers = Tables.events(spark, Sf0001).select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers)
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-12)
    rows.foreach(r => assert(Set("0_none", "1_view", "2_click", "3_purchase")(r.getString(0))))
  }

  test("cohort_retention: offset 0 covers every cohort user; offsets are non-negative") {
    val rows = EventAnalytics.cohortRetention(spark, Sf0001).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
    rows.foreach { case (_, off, n) => assert(off >= 0 && n >= 1) }
    // every user is active in their own first week, so the offset-0 row of
    // each cohort counts exactly that cohort's members
    val cohortSizes = Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(date_trunc("week", min(col("ts"))).as("w"))
      .groupBy(col("w")).count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val offset0 = rows.collect { case (w, 0L, n) => w -> n }.toMap
    assert(offset0 === cohortSizes)
  }
}
