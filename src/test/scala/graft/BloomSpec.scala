package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SharedSpark._
import graft.functions.BloomContains
import graft.functions.BloomContains.bloom_contains

/** [[graft.functions.BloomContains]] + the bloom-prefiltered contamination
  * screen (SURVEY §2.L). The sketch itself is probabilistic and so not
  * oracle-able; what IS exact — no false negatives, bounded false
  * positives, prefilter+confirm ≡ exact join — is pinned here, and the
  * registered query `dedup_bloom_prefilter` additionally passes the full
  * DuckDB oracle (the filter is invisible in exact output).
  */
class BloomSpec extends AnyFunSuite {

  private def sketchOf(hashes: Seq[Long], capacity: Long = 4096L, fpp: Double = 0.01): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(capacity, fpp)
    hashes.foreach(bf.putLong)
    BloomContains.serialize(bf)
  }

  test("no false negatives: every inserted hash probes true (codegen path over a real column)") {
    val inserted = (0L until 1000L).map(i => i * 2654435761L)
    val bytes = sketchOf(inserted)
    val df = spark.range(1000).select((col("id") * 2654435761L).as("h"))
    val hits = df.where(bloom_contains(lit(bytes), col("h"))).count()
    assert(hits === 1000L, "a Bloom filter can never miss an inserted element")
  }

  test("false positives bounded: non-inserted probes pass at <= ~3x the built fpp") {
    val inserted = (0L until 1000L).map(i => i * 2654435761L)
    val bytes = sketchOf(inserted)
    // Disjoint probe set (odd multipliers can collide with inserted values
    // only by accident; screen them out exactly).
    val insertedSet = inserted.toSet
    val probes = (0L until 10000L).map(i => i * 7919L + 3L).filterNot(insertedSet)
    val df = spark.createDataFrame(probes.map(Tuple1(_))).toDF("h")
    val fp = df.where(bloom_contains(lit(bytes), col("h"))).count()
    assert(fp <= (probes.size * 0.03).toLong, s"fp=$fp of ${probes.size} — fpp far above the built 1%")
  }

  test("empty filter (nothing inserted): every probe is definitely-absent") {
    val bytes = sketchOf(Seq.empty)
    val hits = spark.range(1000)
      .where(bloom_contains(lit(bytes), col("id"))).count()
    assert(hits === 0L, "an empty Bloom filter must reject every probe")
  }

  test("null semantics: null probe and null sketch both yield NULL, not a crash") {
    val bytes = sketchOf(Seq(1L, 2L))
    val df = spark.sql("SELECT CAST(NULL AS BIGINT) AS h UNION ALL SELECT 1L")
    val out = df.select(bloom_contains(lit(bytes), col("h")).as("c")).collect()
    assert(out.count(_.isNullAt(0)) === 1 && out.count(r => !r.isNullAt(0) && r.getBoolean(0)) === 1)
    val nullSketch = spark.range(1)
      .select(bloom_contains(lit(null).cast("binary"), col("id")).as("c"))
      .head()
    assert(nullSketch.isNullAt(0))
  }

  test("SQL registry surface: bloom_contains callable from spark.sql, wrong arity is WRONG_NUM_ARGS") {
    GraftExtensions.register(spark)
    val bytes = sketchOf(Seq(42L))
    // The sketch must be a literal AT ANALYSIS TIME (a projected alias is
    // an attribute until the optimizer collapses projects — too late for
    // the foldable check), which in raw SQL means a binary X'..' literal.
    val hex = bytes.map(b => f"$b%02X").mkString
    val out = spark.sql(s"SELECT bloom_contains(X'$hex', 42L) AS c").head()
    assert(out.getBoolean(0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("bloom_contains(CAST('' AS BINARY))").collect()
    }
    assert(e.getCondition != null && e.getCondition.startsWith("WRONG_NUM_ARGS"))
  }

  test("non-foldable sketch argument is rejected at analysis time") {
    val df = spark.range(2).select(expr("CAST(NULL AS BINARY)").as("b"), col("id"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      // col("b") is a per-row column, not a literal — the plan-lifetime
      // deserialize contract would be violated silently without the check.
      df.select(bloom_contains(col("b"), col("id"))).collect()
    }
    assert(e.getMessage.contains("foldable"))
  }

  test("dedup_bloom_prefilter == exact-join recompute at sf0.001 (prefilter invisible in output)") {
    val got = CorpusPrep.dedupBloomPrefilter(spark, Sf0001).collect()
    val pfx = array_join(slice(filter(split(lower(col("text")), " "), t => t =!= lit("")), 1, 10), " ")
    val docs = Tables.documents(spark, Sf0001).select(col("doc_id"), col("source"), pfx.as("pfx"))
    val ref = docs.where(col("doc_id") % 10 === 0).select("pfx").distinct()
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val expect = corpus.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(
        corpus.join(ref, Seq("pfx"), "left_semi")
          .groupBy("source").agg(count(lit(1)).as("n_contaminated")),
        Seq("source"), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .orderBy("source")
      .collect()
    assert(got.toSeq === expect.toSeq)
    assert(got.map(_.getLong(1)).sum > 0, "degenerate fixture: corpus side empty")
  }

  private val CorpusPrep = graft.queries.CorpusPrep
}
