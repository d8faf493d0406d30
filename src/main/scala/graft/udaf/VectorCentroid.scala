package graft.udaf

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.K2 / §2.D9): element-wise centroid of float
  * vectors via `Aggregator` — the user-facing extension surface for custom
  * aggregation. The oracle-checked centroid query uses the posexplode
  * formulation (both engines can run that math); this Aggregator is the
  * single-pass alternative a user would reach for, and the test suite
  * asserts the two agree.
  *
  * Merge is associative and commutative (element-wise double sums), so the
  * partial/final aggregation Spark plans for it is correct on any cluster
  * layout; buffer size is O(dims), independent of row count.
  */
class VectorCentroid(dims: Int) extends Aggregator[Array[Float], VectorCentroid.Buf, Array[Double]] {
  import VectorCentroid.Buf

  override def zero: Buf = Buf(new Array[Double](dims), 0L)

  override def reduce(b: Buf, v: Array[Float]): Buf = {
    var i = 0
    while (i < dims && i < v.length) { b.sums(i) += v(i).toDouble; i += 1 }
    Buf(b.sums, b.n + 1)
  }

  override def merge(x: Buf, y: Buf): Buf = {
    var i = 0
    while (i < dims) { x.sums(i) += y.sums(i); i += 1 }
    Buf(x.sums, x.n + y.n)
  }

  override def finish(b: Buf): Array[Double] =
    if (b.n == 0) new Array[Double](dims) else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object VectorCentroid {
  case class Buf(sums: Array[Double], n: Long)
}
