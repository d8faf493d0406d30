package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen per-row character-bigram histogram: every 2-codepoint
  * window of the string, counted, in first-occurrence order — one
  * O(bytes) pass returning `array<struct<bg string, cnt bigint>>`.
  *
  * Why a custom Expression (SURVEY §4.3 — only after a measured BENCH
  * need): the composed form in `bigram_lm_score`,
  * `explode(sequence(1, length(text)-1))` + `substring(text, i, 2)` +
  * `groupBy(doc_id, bg).count()`, materializes one ROW PER CHARACTER of
  * the corpus (65M rows at sf1) through Generate, a projection, and a
  * 4.59M-group partial hash aggregate — the query's dominant stage even
  * after the r11 single-pass fix (~52 core-s at sf1). This expression
  * folds that entire explode+count into a per-document JIT'd loop: one
  * codepoint-boundary walk, one LinkedHashMap of ~|alphabet|² entries,
  * and the downstream plan starts from the ALREADY-COUNTED (bg, cnt)
  * pairs (~92/doc), never seeing the per-character stream.
  *
  * Semantics match the engines' shared intent (and the DuckDB oracle's
  * `range(1, length(text))` windows) exactly: bigrams are the
  * length-2 codepoint windows at starts 1..len-1 (1-based), so a
  * doc with fewer than 2 codepoints yields an empty array. Codepoint
  * boundaries are walked with the same UTF-8 leading-byte arithmetic
  * UTF8String.substring uses, so every emitted `bg` is byte-identical to
  * `substring(text, i, 2)`. (The retired Spark-side composed form had
  * one fixture-unreachable degenerate divergence: for a 1-codepoint doc,
  * `sequence(1, 0)` steps DOWNWARD to [1, 0] and emits two 1-char
  * "bigrams" where DuckDB's `range(1, 1)` is empty — this expression
  * sides with the oracle, the q1-style guard `length >= 2`, and common
  * sense. No fixture document has fewer than 2 codepoints; pinned in
  * RetrievalSpec.)
  */
case class CharBigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_bigram_counts expects string, got $other")
    }

  override def dataType: DataType = CharBigramCounts.OutType

  override def nullSafeEval(input: Any): Any =
    CharBigramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.CharBigramCounts.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharBigramCounts {

  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("bg", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  /** Shared by interpreted eval and generated code (one JIT-able body). */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // codepoint start offsets, walked with UTF8String's leading-byte rule
    var starts = new Array[Int](math.min(n + 1, 64))
    var m = 0
    var off = 0
    while (off < n) {
      if (m == starts.length) starts = java.util.Arrays.copyOf(starts, starts.length * 2)
      starts(m) = off
      m += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    if (m == starts.length) starts = java.util.Arrays.copyOf(starts, starts.length + 1)
    starts(m) = n
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < m - 1) {
      val from = starts(i)
      val until = starts(i + 2)
      val bg = UTF8String.fromBytes(bytes, from, until - from)
      // absent key unboxes to 0L (BoxesRunTime.unboxToLong(null)), and a
      // stored count is never 0 — so prev + 1 is correct in both cases
      counts.put(bg, counts.get(bg) + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (bridged via the shared [[ColumnBridge]]). */
  def char_bigram_counts(text: Column): Column =
    ColumnBridge.toColumn(CharBigramCounts(ColumnBridge.toExpr(text)))
}
