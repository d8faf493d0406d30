package graft

import org.scalatest.funsuite.AnyFunSuite
import SharedSpark._

/** Pins the PLAN SHAPES the round-14 rework established, so a refactor (or
  * a Catalyst behavior change on upgrade) cannot silently re-introduce the
  * two failure modes it removed:
  *
  *  1. an aggregate-over-window keyed on a bounded signature space
  *     (simhash / LSH bkt — 2^16 values, so one window partition is one
  *     task holding a corpus-proportional bucket; VERDICT r13 item 1), and
  *  2. a split featurizer — the expensive signature pass planned once per
  *     consumer because asymmetric inferred-isnotnull filters or column
  *     pruning broke exchange reuse (BENCH_NOTES §42).
  *
  * These assert on `executedPlan.toString` of the STATIC plan (same posture
  * as tools/PlanAudit: AQE off — the adaptive wrapper renders exchange
  * reuse only at runtime), in an AQE-off child session sharing the test
  * context. Cheap — nothing executes.
  */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val staticSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(staticSession, Sf001).queryExecution.executedPlan.toString()

  /** windowspecdefinition partition columns (order columns carry ASC/DESC
    * markers and are filtered out) — the same extraction PlanAudit prints. */
  private def windowKeys(p: String): Seq[String] =
    "windowspecdefinition\\((.*?)specifiedwindowframe".r
      .findAllMatchIn(p)
      .flatMap(_.group(1).split(", ")
        .filterNot(t => t.contains(" ASC") || t.contains(" DESC") || t.trim.isEmpty)
        .map(_.trim.takeWhile(_ != '#')).filter(_.nonEmpty))
      .toSeq

  test("no WindowExec keyed on a bounded signature (simhash / LSH bkt) anywhere in the registry") {
    // The full-registry sweep lives in tools/PlanAudit (per-round); this
    // pins the three queries the r14 rewrite touched plus the registered
    // simhash query itself, where a regression would land first.
    for (q <- Seq("dedup_overlap_report", "dedup_embedding_doc_lsh",
                  "dedup_embedding_doc_probe", "dedup_simhash")) {
      val keys = windowKeys(plan(q))
      assert(!keys.exists(k => k == "simhash" || k == "bkt"),
        s"$q plans a window partitioned on a bounded signature key: $keys")
    }
  }

  test("doc-embedding LSH screen plans ONE featurizer (single scan, reused exchange)") {
    val p = plan("dedup_embedding_doc_lsh")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan, found $scans — the df-cap " +
      "gate branch stopped reusing the featurizer exchange (BENCH_NOTES §42)")
    assert("ReusedExchange".r.findAllIn(p).size >= 2,
      "expected the count agg and the self-join b-side to read ReusedExchange")
  }

  test("overlap report plans the simhash bit-sum pass ONCE") {
    val p = plan("dedup_overlap_report")
    // the per-doc signature merge is the expensive subtree; the partial
    // bit-sum aggregate appearing twice means the MIN agg branch and the
    // probe branch each planned their own signature pass
    // one HashAggregate carries 16 per-bit partial_sums — count the
    // aggregate OPERATORS (functions=[partial_sum...), not the expressions
    val bitSumPasses = "functions=\\[partial_sum\\(CASE WHEN substring".r.findAllIn(p).size
    assert(bitSumPasses == 1,
      s"simhash bit-sum partial aggregate appears $bitSumPasses times — " +
        "the flag frame's two consumers stopped sharing the signature pass")
  }
}
