package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen membership probe against a serialized Spark
  * [[org.apache.spark.util.sketch.BloomFilter]] (SURVEY §2.L: the
  * cross-corpus dedup prefilter).
  *
  * `bloom_contains(sketch, h)` — `sketch` must be a FOLDABLE binary
  * expression (the sketch bytes as a literal, built once on the driver by
  * `df.stat.bloomFilter` and shipped to executors inside the serialized
  * plan, exactly like a broadcast-hash-join build but kilobytes instead of
  * the whole table); `h` is the xxhash64/long being probed. Returns true
  * iff the filter MIGHT contain `h`: false positives at the configured
  * fpp, false negatives never — so `NOT bloom_contains(...)` is an exact
  * "definitely absent" filter, and the positive side must be confirmed by
  * an exact join when exactness matters.
  *
  * Why an Expression and not a UDF: the probe sits in the hot path of a
  * full-corpus scan (every row of the non-reference side); as a native
  * expression it stays inside whole-stage codegen — the deserialized
  * filter is a plan-lifetime reference object, the per-row cost is two
  * xxhash-mix rounds on a long and K bit-tests, no boxing.
  *
  * The foldable requirement mirrors Spark's own runtime-rowgroup-filter
  * expression (BloomFilterMightContain): the sketch is deserialized ONCE
  * per plan (transient lazy), never per row and never per batch.
  */
case class BloomContains(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if !left.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "bloom_contains expects the sketch argument to be a literal/foldable binary " +
            "(build it on the driver with df.stat.bloomFilter and pass the serialized bytes)")
      case (BinaryType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains expects (binary, bigint), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType

  /** NULL sketch or NULL probe value → NULL (standard SQL null-in/null-out;
    * nullSafeEval/nullSafeCodeGen provide exactly that). */
  override def nullable: Boolean = left.nullable || right.nullable

  /** Deserialized once per plan instantiation on each executor; @transient
    * so the serialized plan carries only the literal bytes. Null iff the
    * foldable sketch evaluates to SQL NULL. */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null)
    if (bytes == null) null
    else BloomFilter.readFrom(bytes.asInstanceOf[Array[Byte]])
  }

  override def nullSafeEval(sketchBytes: Any, h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The filter object (not the bytes) is the codegen reference: probing
    // is a direct virtual call on a plan-lifetime object. The sketch child
    // still participates in null semantics via nullSafeCodeGen (its
    // "evaluation" is a constant-folded literal reference — free).
    val bf = ctx.addReferenceObj("graftBloomFilter", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, h) => s"${ev.value} = $bf.mightContainLong($h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BloomContains {

  /** Serialize a driver-built filter to the byte form `bloom_contains`
    * takes as its first (literal) argument. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Column-API entry point: `bloom_contains(lit(sketchBytes), h)`. */
  def bloom_contains(sketch: Column, h: Column): Column =
    ColumnBridge.toColumn(BloomContains(ColumnBridge.toExpr(sketch), ColumnBridge.toExpr(h)))
}
