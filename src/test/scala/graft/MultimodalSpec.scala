package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import SharedSpark._

class MultimodalSpec extends AnyFunSuite {

  test("synthetic media carries a real binary column") {
    val m = Multimodal.syntheticMedia(spark, Sf0001)
    assert(m.schema("content").dataType.typeName === "binary")
    assert(m.count() === 500)
  }

  test("partition-batched decode emits one metadata row per payload") {
    val meta = Multimodal.extractMeta(spark, Multimodal.syntheticMedia(spark, Sf0001))
    assert(meta.count() === 500)
    // stub arithmetic holds row-wise
    val bad = meta
      .where(
        col("width") =!= (col("byte_len") % 640 + 1).cast("int") ||
          col("height") =!= (col("byte_len") % 480 + 1).cast("int"))
      .count()
    assert(bad === 0)
  }

  test("decode runs distributed: plan has no driver-side collect") {
    val meta = Multimodal.multimodalMeta(spark, Sf0001)
    // mapPartitions shows up as a (De)SerializeFromObject + MapPartitions plan
    val plan = meta.queryExecution.executedPlan.toString()
    assert(plan.contains("MapPartitions"), plan.take(500))
  }

  test("checksum matches Spark's own md5 of the same bytes") {
    val meta = Multimodal.extractMeta(spark, Multimodal.syntheticMedia(spark, Sf0001))
    val expected = Tables
      .documents(spark, Sf0001)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
    val joined = meta.join(expected, "doc_id").where(col("checksum_md5") =!= col("m"))
    assert(joined.count() === 0)
  }
}
