package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.udaf.VectorCentroid
import SharedSpark._

class UdafSpec extends AnyFunSuite {

  test("K2: typed Aggregator centroid agrees with the posexplode query") {
    val cent = udaf(new VectorCentroid(64))
    val viaUdaf = Tables
      .embeddings(spark, Sf0001)
      .groupBy(col("label"))
      .agg(cent(col("embedding")).as("centroid"))
      .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "v")))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      .toMap

    val viaQuery = graft.queries.Vectors
      .aggVectorCentroid(spark, Sf0001)
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1).toInt), r.getDouble(2)))
      .toMap

    assert(viaUdaf.keySet === viaQuery.keySet)
    viaUdaf.foreach { case (k, v) =>
      // double-sum order differs from the fixed-point path; compare within
      // float-noise tolerance
      assert(math.abs(v - viaQuery(k)) < 1e-9, s"at $k: $v vs ${viaQuery(k)}")
    }
  }
}
