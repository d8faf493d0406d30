package graft

import org.scalatest.funsuite.AnyFunSuite
import SharedSpark._

/** Contract discipline + non-emptiness for every registered query.
  * The full value-level check is the driver's DuckDB compare (and its dev
  * mirror tools/check.py); this suite guards the register itself.
  */
class QueriesSmokeSpec extends AnyFunSuite {

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is non-empty on sf0.001") {
      assert(fn(spark, Sf0001).count() > 0, s"query $name returned 0 rows")
    }
  }
}
