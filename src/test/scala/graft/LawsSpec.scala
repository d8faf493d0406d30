package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Relational, Windows}
import SharedSpark._

/** Algebraic laws (SURVEY §5.2.4): randomized small-input properties with a
  * fixed seed (deterministic, offline-friendly) plus invariants over the
  * real fixtures.
  */
class LawsSpec extends AnyFunSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def smallList(): List[Long] = List.fill(20)(rnd.nextLong(10))

  test("unionAll count additivity") {
    (1 to 10).foreach { _ =>
      val (a, b) = (smallList(), smallList())
      assert(a.toDF("x").unionAll(b.toDF("x")).count() === a.size + b.size)
    }
  }

  test("except(a, a) is empty; intersect(a, a) = distinct(a)") {
    (1 to 10).foreach { _ =>
      val a = smallList()
      val da = a.toDF("x")
      assert(da.except(da).count() === 0)
      assert(da.intersect(da).count() === a.distinct.size)
    }
  }

  test("dedup is idempotent") {
    (1 to 10).foreach { _ =>
      val d1 = smallList().toDF("x").distinct()
      assert(d1.distinct().count() === d1.count())
    }
  }

  test("sessionize invariants on sf0.001: partition of events, ordered spans") {
    val sessions = Windows.sessionize(spark, Sf0001).cache()
    val events = Tables.events(spark, Sf0001)
    assert(sessions.agg(sum("n_events")).head().getLong(0) === events.count())
    assert(sessions.where(col("session_start") > col("session_end")).count() === 0)
    assert(sessions.count() <= events.count())
    sessions.unpersist()
  }

  test("as-of join: last_view_ts never exceeds the purchase ts") {
    val asof = Relational.joinAsof(spark, Sf0001)
    assert(asof.where(col("last_view_ts") > col("ts")).count() === 0)
  }

  /** MinHash estimate vs exact Jaccard — the scheme used by
    * dedup_minhash_lsh, checked against its statistical error bound.
    */
  test("md5 minhash approximates Jaccard within 3 sigma (16 seeds)") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def minhash(set: Set[String], seeds: Int): Seq[String] =
      (0 until seeds).map(i => set.map(t => md5hex(s"$t#$i")).min)
    (1 to 10).foreach { _ =>
      val a = List.fill(60)("tok" + (1 + rnd.nextInt(40))).toSet
      val b = List.fill(60)("tok" + (1 + rnd.nextInt(40))).toSet
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val seeds = 16
      val est = minhash(a, seeds)
        .zip(minhash(b, seeds))
        .count { case (x, y) => x == y }
        .toDouble / seeds
      val sigma = math.max(math.sqrt(exact * (1 - exact) / seeds), 0.08)
      assert(math.abs(est - exact) <= 3 * sigma + 1e-9, s"jaccard=$exact est=$est")
    }
  }
}
