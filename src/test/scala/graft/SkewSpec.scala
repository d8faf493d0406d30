package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew
import SharedSpark._

class SkewSpec extends AnyFunSuite {

  test("salted two-phase aggregation is bit-identical to the direct plan") {
    // events grouped by event_type: 5 hot keys over 1000 rows — the skew shape
    val ev = Tables.events(spark, Sf0001)
    val direct = ev
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    Seq(4, 16, 64).foreach { buckets =>
      val salted = Skew
        .saltedCountSum(ev, "event_type", "value", buckets)
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
        .toMap
      assert(salted === direct, s"buckets=$buckets")
    }
  }

  test("salt actually spreads a hot key over the requested buckets") {
    val ev = Tables.events(spark, Sf0001)
    val spread = ev
      .withColumn("__salt", Skew.contentSalt(16, ev.columns.map(col).toSeq: _*))
      .where(col("event_type") === "view")
      .select(countDistinct(col("__salt")))
      .head()
      .getLong(0)
    assert(spread >= 12, s"only $spread of 16 salt buckets used")
  }

  test("documented caveat: byte-identical rows collapse to one bucket (correct, unspread)") {
    // This pins the honest boundary in Skew's scaladoc: a content salt
    // cannot spread rows that are identical in every hashed column — the
    // aggregate stays CORRECT (phase 2 merges exact decimals) but that
    // key degrades to the unsalted single-reducer shape. If this test
    // starts failing because spread appeared, the salt gained a
    // nondeterministic input — which would be the retry-safety bug.
    import spark.implicits._
    val dupes = Seq.fill(500)(("hot", 1.0)).toDF("k", "value")
    val spread = dupes
      .withColumn("__salt", Skew.contentSalt(16, dupes.columns.map(col).toSeq: _*))
      .select(countDistinct(col("__salt")))
      .head().getLong(0)
    assert(spread === 1L)
    val out = Skew.saltedCountSum(dupes, "k", "value", 16).collect()
    assert(out.length === 1 && out.head.getLong(1) === 500L && out.head.getDouble(2) === 500.0)
  }

  test("salted join spreads a 10x-hot join key across reducers and preserves the result (sf0.1)") {
    // VERDICT r5 item 7: demonstrate a skewed JOIN key surviving, not just
    // a skewed aggregation. Synthesized skew over the real sf0.1 events
    // table (100 k rows): half of all rows collapse onto ONE hot user_id,
    // the rest spread over ~1000 cold users — the one-hot-key-at-10x+
    // shape. The build side (per-user dim) is joined with a merge hint so
    // the demonstration exercises the SHUFFLE join path (a broadcast join
    // has no reducer skew to fix; AQE's OptimizeSkewedJoin stays inert at
    // this size because the hot partition is far below its split
    // threshold — exactly the regime saltedJoin exists for).
    val hot = 42L
    val fact = Tables.events(spark, "/root/testdata/sf0.1")
      .select(
        col("event_id"),
        when(col("event_id") % 2 === 0, hot).otherwise(col("user_id") + 1000L).as("user_id"),
        col("value"))
    val dim = fact.select(col("user_id")).distinct()
      .withColumn("user_attr", col("user_id") % 7)
    def partitionSizes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().toSeq
    // records-per-reducer is the deterministic proxy for task-time spread
    // (each output row costs one probe): the unsalted join's max partition
    // carries every hot row; the salted one caps near hotRows/buckets.
    // AQE off for the measurement — its partition coalescing would merge
    // these (byte-wise tiny) reducers and hide the record skew being
    // demonstrated; 32 reducers so the ideal share is well below the hot
    // key's row count.
    val (aqe0, shuf0) = (spark.conf.get("spark.sql.adaptive.enabled"),
      spark.conf.get("spark.sql.shuffle.partitions"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val unsalted = fact.join(dim.hint("merge"), Seq("user_id"))
      val salted = Skew.saltedJoin(fact, dim.hint("merge"), "user_id", buckets = 16)
      val totalRows = unsalted.count()
      val hotRows = fact.where(col("user_id") === hot).count()
      val maxUnsalted = partitionSizes(unsalted).max
      val maxSalted = partitionSizes(salted).max
      assert(hotRows >= totalRows / 2 - 1, s"skew setup broken: hotRows=$hotRows of $totalRows")
      assert(maxUnsalted >= hotRows, s"unsalted max partition $maxUnsalted < hot key's $hotRows rows")
      assert(maxSalted <= maxUnsalted / 4,
        s"salting did not spread: max $maxSalted vs unsalted $maxUnsalted")
      // identical join result, row-for-row
      val cols = Seq("user_id", "event_id", "value", "user_attr").map(col)
      assert(salted.select(cols: _*).orderBy(cols: _*).collect()
        === unsalted.select(cols: _*).orderBy(cols: _*).collect())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe0)
      spark.conf.set("spark.sql.shuffle.partitions", shuf0)
    }
  }

  test("salt is deterministic across recomputation (retry safety)") {
    // The same row must land in the same bucket on every evaluation — the
    // property a monotonically_increasing_id / rand salt lacks (a retried
    // map task would re-salt rows inconsistently with surviving output).
    val ev = Tables.events(spark, Sf0001)
    val salted = ev.withColumn(
      "__salt", Skew.contentSalt(16, ev.columns.map(col).toSeq: _*))
    val a = salted.select(col("event_id"), col("__salt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = salted.select(col("event_id"), col("__salt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
  }

  // ------------------------- LSH equal-mass bucket skew defense (round 9)

  /** A deterministic BIASED corpus: per-dimension sign probability
    * Φ(0.7) ≈ 0.76 (bias +0.7 against unit noise), so the 16-bit sign
    * integers
    * concentrate around the bias pattern and equal-WIDTH radix bins
    * inherit the density — the real-corpus failure mode the fixture data
    * (i.i.d. fair sign bits, docs/LSH_OCCUPANCY.md) cannot exhibit.
    * Hash-based like tools/DataGen: pure function of (vec_id, dim), no
    * rand(), bit-identical at any parallelism.
    */
  private def biasedEmbeddings(n: Int) = {
    val P = 1000000007L
    spark.range(n).selectExpr(
      "id AS vec_id",
      s"""transform(sequence(0, 63), j -> CAST(
         |  0.7 + sqrt(-2.0 * ln((pmod(xxhash64('b_u1', id, j), ${P}L) + 1) / ${P + 1}.0))
         |      * cos(2.0 * pi() * ((pmod(xxhash64('b_u2', id, j), ${P}L) + 1) / ${P + 1}.0))
         |  AS FLOAT))""".stripMargin + " AS embedding")
  }

  private def maxOcc(tb: org.apache.spark.sql.DataFrame): Long =
    tb.groupBy(col("t"), col("bkt")).count()
      .agg(max(col("count"))).head().getLong(0)

  test("equal-width LSH bins skew on a biased corpus; equal-mass bins restore the target") {
    val emb = biasedEmbeddings(2000).cache()
    try {
      val target = 125L // LshTargetOccupancy; nb floors at 16 for n=2000
      val width = maxOcc(graft.queries.Vectors.lshBucketTableOf(emb))
      val mass = maxOcc(graft.queries.Vectors.lshBucketTableEqualMass(emb))
      // the failure mode is real: the hottest equal-width bin carries the
      // modal sign-prefix mass (≈ 0.73^4 ≈ 28% of the corpus)
      assert(width > 3 * target, s"biased corpus did not skew equal-width bins (max=$width)")
      // ... and the histogram binning flattens it back to ≈ target
      assert(mass <= 2 * target, s"equal-mass bins still skewed (max=$mass)")
    } finally emb.unpersist()
  }

  test("equal-mass LSH bins match equal-width occupancy on uniform data (no regression)") {
    // the fixture embeddings ARE uniform-sign (LSH_OCCUPANCY) — both
    // binnings should sit at the pinned occupancy there
    val emb = Tables.embeddings(spark, Sf001).select(col("vec_id"), col("embedding")).cache()
    try {
      val width = maxOcc(graft.queries.Vectors.lshBucketTableOf(emb))
      val mass = maxOcc(graft.queries.Vectors.lshBucketTableEqualMass(emb))
      assert(width <= 2 * 125 && mass <= 2 * 125, s"width=$width mass=$mass")
    } finally emb.unpersist()
  }

  test("join_skew_salted query == plain-join aggregate (sf0.01)") {
    // the registered query routes lineitem⋈supplier through saltedJoin;
    // its oracle is the PLAIN join SQL — pin the equivalence in-JVM too
    val got = graft.queries.Relational.joinSkewSalted(spark, Sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val plain = Tables.lineitem(spark, Sf001)
      .join(Tables.supplier(spark, Sf001), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nation"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy(col("nation"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && got === plain)
  }
}
