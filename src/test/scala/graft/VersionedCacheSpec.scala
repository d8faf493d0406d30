package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.VersionedCache
import SharedSpark._

class VersionedCacheSpec extends AnyFunSuite {

  test("append-only runs, latest view, partition-pruned run diff") {
    val path = java.nio.file.Files.createTempDirectory("graft-cache").toString + "/docs"
    val docs = Tables
      .documents(spark, Sf0001)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))

    // run 1: docs 0..399; run 2: docs 100..499, every 50th "edited"
    VersionedCache.appendRun(docs.where(col("doc_id") < 400), path, "r1")
    VersionedCache.appendRun(
      docs
        .where(col("doc_id") >= 100)
        .withColumn(
          "content_hash",
          when(col("doc_id") % 50 === 0, md5(concat(col("content_hash"), lit("v2")).cast("binary")))
            .otherwise(col("content_hash"))),
      path,
      "r2")

    // latest: keys 0..99 resolve to r1, 100..499 to r2
    val latest = VersionedCache.latest(spark, path, "doc_id")
    assert(latest.count() === 500)
    assert(latest.where(col("run_id") === "r2").count() === 400)

    // diff r1 -> r2
    val diff = VersionedCache.diffRuns(spark, path, "doc_id", "content_hash", "r1", "r2")
    val byStatus = diff.groupBy("status").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byStatus("added") === 100)    // 400..499
    assert(byStatus("removed") === 100)  // 0..99
    // changed: every 50th doc in [100, 400): 100,150,...,350
    assert(byStatus("changed") === 6)
    assert(byStatus("unchanged") === 294)

    // the two-run diff prunes partitions: only r1/r2 reach the scan
    val plan = VersionedCache
      .diffRuns(spark, path, "doc_id", "content_hash", "r1", "r2")
      .queryExecution
      .executedPlan
      .toString()
    assert(plan.contains("PartitionFilters"), plan.take(600))
  }
}
