package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding / similarity-search operators (SURVEY §2.I7–I9 + north star):
  * brute-force kNN, cosine top-k, LSH-bucketed approximate kNN, and
  * per-label centroids.
  *
  * Determinism: dot products fold left-to-right over the vector in double
  * (float→double widening is exact; the oracle replays the identical
  * sequential fold via list_reduce with a prepended 0.0, so the binary
  * result matches bit-for-bit). Centroid sums go through exact decimals.
  *
  * Scale posture: brute force is O(n²) by design and exists as the
  * correctness baseline; the LSH-bucketed variant is the 100 TB path —
  * candidates come from an equi-join on a sign-bucket key, so the pair
  * space shrinks from n² to Σ bucket². At cluster scale the bucket join
  * shuffles on the bucket key and AQE handles skewed buckets.
  */
object Vectors {

  /** Sequential double dot product of two float-array columns — the native
    * codegen expression (graft.functions.VecDot). Same fold order as the
    * oracle's list_reduce, ~19× faster than the zip_with+aggregate HOF
    * form at sf0.1 (measured; see VecDot scaladoc).
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.vec_dot(a, b)

  /** The oracle twin of `dot` — identical fold order and bracketing. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  /** Input-size bound for the deliberate O(n²) all-pairs operators
    * (knn_brute_force / cosine_topk / dedup_embedding_cosine). They exist
    * as oracle-calibration baselines for the bucketed scale paths
    * (knn_lsh_bucketed / ann_ivf / dedup_embedding_lsh); above this bound
    * the pair space exceeds ~0.5×10¹² and no cluster should reach the path
    * by accident (VERDICT r5 item 5). Raise explicitly to opt in.
    */
  val AllPairsMaxRowsConf = "spark.graft.allPairs.maxRows"
  private val AllPairsMaxRowsDefault = 1000000L

  /** Runtime guard: a BOUNDED probe — `limit(bound + 1).count()` — so the
    * guard itself costs O(bound), not a full scan of the input (ADVICE r6:
    * the earlier full `count()` re-scanned the whole table on every
    * invocation, including inside the timed bench region). A result of
    * bound + 1 means "more than bound rows exist"; nothing is collected.
    */
  private[queries] def guardAllPairs(spark: SparkSession, input: DataFrame, op: String): Unit = {
    val bound = spark.conf.getOption(AllPairsMaxRowsConf)
      .map(_.toLong).getOrElse(AllPairsMaxRowsDefault)
    // limit() takes an Int; a bound at or above Int.MaxValue means the
    // caller has explicitly opted into an unguardable pair space.
    if (bound >= Int.MaxValue.toLong) return
    val probed = input.limit(bound.toInt + 1).count()
    if (probed > bound) throw new IllegalStateException(
      s"$op is an O(n²) all-pairs oracle-calibration operator; its input has " +
        s"more than $AllPairsMaxRowsConf=$bound rows. Use the bucketed scale path " +
        "(knn_lsh_bucketed / ann_ivf / dedup_embedding_lsh), or raise the bound to opt in.")
  }

  // ---------------------------------------------------------------- §2.I8
  /** Brute-force kNN: all-pairs dot product, global top-20.
    *
    * The stream side is explicitly repartitioned across all cores: the
    * vectors arrive as ONE small parquet file (one scan partition), but the
    * work is O(n²) in the row count — without the repartition the entire
    * pair loop runs on a single task (measured: 1.6 s single-task vs ~0.5 s
    * across 32 at sf0.1). Harness-gated via Det.spreadSmallScan so a real
    * cluster (scan parallelism from row-group splits) never pays the
    * exchange. TakeOrderedAndProject keeps top-k per partition before the
    * driver merge — no global sort of the pair stream.
    */
  def knnBruteForce(spark: SparkSession, sf: String): DataFrame = {
    val e = Tables.embeddings(spark, sf)
    guardAllPairs(spark, e.select(col("vec_id")), "knn_brute_force")
    val a = Det.spreadSmallScan(spark, e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), dot(col("emb_a"), col("emb_b")).as("dot"))
      .orderBy(col("dot").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(20)
  }

  val knnBruteForceSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${dotSql("a.embedding", "b.embedding")} AS dot
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |ORDER BY dot DESC, vec_a ASC, vec_b ASC LIMIT 20""".stripMargin

  // -------------------------------------------- quantized-store kNN scan
  /** Top-3 neighbors per query over the INT8-QUANTIZED embedding store —
    * the memory-bound production scan path (round-8 addition): a corpus
    * whose vectors are stored 4× smaller (the [[embeddingQuantize]]
    * representation) is linearly scanned with integer dot products. This
    * is the asymmetric sibling of the float brute force: same query set
    * convention as ann_ivf (vec_id < 10), self excluded, rank by
    * (int_dot DESC, neighbor ASC).
    *
    * Scale shape: the 10-row quantized query side BROADCASTS onto the
    * corpus scan — cost is one linear pass (n·|queries| integer dots),
    * never all-pairs, so no guard is needed. All arithmetic after
    * quantization is EXACT int64 (|q| ≤ 127, 64 dims ⇒ |dot| ≤ 2²⁰), so
    * both engines agree bit-for-bit; the quantization itself reuses the
    * embedding_quantize formula (norm fold + round-half-up ×127), already
    * hash-proven across engines. Recall vs the float brute force is
    * pinned in ExtrasSpec (int8 on unit-normed vectors loses < 1% top-3
    * overlap here; floor 0.6).
    */
  def knnQuantized(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norm = 0 (all-zero embedding) quantizes to all-zero q explicitly —
    // unguarded, x/0 yields NaN whose CAST diverges across engines
    // (Spark non-ANSI → 0, DuckDB → error). Mirrored in the oracle and in
    // embeddingQuantize (ADVICE r8). Fixtures contain no zero vectors, so
    // current hashes are unchanged.
    val q8 = Det.spreadSmallScan(spark, Tables.embeddings(spark, sf))
      .withColumn(
        "norm",
        sqrt(expr("aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> IF(norm = 0D, 0L, CAST(round(CAST(x AS DOUBLE) / norm * 127.0) AS BIGINT)))")
          .as("q"))
    val queries = q8.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qq"))
    q8.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(
        col("qid"), col("vec_id").as("neighbor"),
        expr("aggregate(zip_with(q, qq, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("int_dot"))
      .withColumn(
        "rank",
        row_number().over(Window.partitionBy(col("qid")).orderBy(col("int_dot").desc, col("neighbor").asc)))
      .where(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("neighbor"), col("int_dot"))
      .orderBy(col("qid"), col("rank"))
  }

  val knnQuantizedSql: String =
    """WITH q8 AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CASE WHEN norm = 0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(round(CAST(x AS DOUBLE) / norm * 127.0) AS BIGINT) END) AS q
      |  FROM (
      |    SELECT vec_id, embedding,
      |      sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |        list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |        (acc, x) -> acc + x)) AS norm
      |    FROM embeddings)
      |), scored AS (
      |  SELECT p.vec_id AS qid, e.vec_id AS neighbor,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, len(e.q) + 1),
      |      i -> e.q[i] * p.q[i])), (acc, x) -> acc + x) AS int_dot
      |  FROM q8 e JOIN (SELECT vec_id, q FROM q8 WHERE vec_id < 10) p
      |    ON e.vec_id <> p.vec_id
      |)
      |SELECT qid, rank, neighbor, int_dot FROM (
      |  SELECT qid, neighbor, int_dot,
      |    row_number() OVER (PARTITION BY qid ORDER BY int_dot DESC, neighbor ASC) AS rank
      |  FROM scored)
      |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  // ---------------------------------------------------------------- §2.I7
  /** Cosine top-k: norms computed once per vector (not per pair), then the
    * same all-pairs join. cosine = dot / (norm_a · norm_b); sqrt is IEEE
    * correctly-rounded, division exact → deterministic.
    */
  def cosineTopk(spark: SparkSession, sf: String): DataFrame = {
    guardAllPairs(spark, Tables.embeddings(spark, sf).select(col("vec_id")), "cosine_topk")
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val a = Det.spreadSmallScan(spark, // parallelize the n² loop (see knnBruteForce)
      e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("norm").as("norm_a")))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("norm").as("norm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(
        col("vec_a"),
        col("vec_b"),
        (dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b"))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(20)
  }

  val cosineTopkSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings
       |)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cosine
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |ORDER BY cosine DESC, vec_a ASC, vec_b ASC LIMIT 20""".stripMargin

  // ------------------------------------ semantic decontamination screen
  /** Embedding-space decontamination: rank the corpus by similarity to a
    * held-out benchmark slice (vec_id % 50 == 0 — the "eval set") and
    * emit the top-100 review queue: each corpus vector's MAX cosine over
    * the benchmark and the benchmark vector that achieves it (ties →
    * lowest bench id, deterministic). This is the semantic counterpart
    * of `contamination_check` (which screens on exact token prefixes):
    * paraphrased or re-formatted benchmark leakage shares no prefix but
    * sits at the top of this ranking. A review QUEUE rather than a fixed
    * threshold because the right cutoff is corpus-specific — the fixture
    * embeddings are i.i.d. gaussians whose cross-slice max cosine tops
    * out ≈0.49, so any conventional 0.9x threshold would make the query
    * vacuously empty (measured; the spec pins the ranking itself).
    *
    * Scale posture — the honest 100 TB decontamination shape: a real
    * eval set is FIXED-SIZE (it does not grow when the corpus does), so
    * the bench slice is capped to the 256 lowest bench ids
    * (deterministic; every fixture SF ≤ sf0.1 falls below the cap, so
    * the oracle exercises both regimes). The capped side BROADCASTS and
    * the corpus is scanned ONCE — BroadcastNestedLoopJoin fan-out
    * ×|bench| collapses in the same stage via partial max aggregation
    * keyed on the (already unique) corpus vec_id, then TakeOrdered(100).
    * Cost is |corpus|·256 VecDots: linear in the corpus. Without the
    * cap this query IS quadratic on the fixtures (bench = vec_id % 50
    * grows with the corpus) — measured e = 2.94 sf1→sf3 before the cap,
    * 21.4 s at sf3; the cap is a semantic statement about eval sets,
    * not a benchmark dodge, and the uncapped form is exactly the
    * guarded all-pairs family's territory. Unlike the knn family there
    * is no per-query index to train — the bench slice changes per
    * audit, the corpus pass is the cost.
    */
  def contaminationSemantic(spark: SparkSession, sf: String): DataFrame = {
    val e = Tables.embeddings(spark, sf).select(
      col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val bench = e.where(col("vec_id") % 50 === 0).select(
        col("vec_id").as("bench_id"), col("embedding").as("bemb"), col("norm").as("bnorm"))
      .orderBy(col("bench_id")).limit(256)
    val corpus = Det.spreadSmallScan(spark, e.where(col("vec_id") % 50 =!= 0))
    corpus.crossJoin(broadcast(bench))
      .groupBy(col("vec_id"))
      .agg(max(struct(
        (dot(col("embedding"), col("bemb")) / (col("norm") * col("bnorm"))).as("cosine"),
        (-col("bench_id")).as("neg_bench"))).as("m"))
      .select(
        col("vec_id"),
        (-col("m.neg_bench")).as("best_bench"),
        col("m.cosine").as("max_cosine"))
      .orderBy(col("max_cosine").desc, col("vec_id").asc)
      .limit(100)
  }

  val contaminationSemanticSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings
       |), b AS (
       |  SELECT vec_id AS bench_id, embedding AS bemb, norm AS bnorm
       |  FROM e WHERE vec_id % 50 = 0
       |  ORDER BY bench_id LIMIT 256
       |), c AS (
       |  SELECT vec_id, embedding, norm FROM e WHERE vec_id % 50 <> 0
       |), s AS (
       |  SELECT c.vec_id, b.bench_id,
       |    ${dotSql("c.embedding", "b.bemb")} / (c.norm * b.bnorm) AS cosine
       |  FROM c CROSS JOIN b
       |), r AS (
       |  SELECT vec_id, bench_id, cosine,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, bench_id ASC) AS rn
       |  FROM s
       |)
       |SELECT vec_id, bench_id AS best_bench, cosine AS max_cosine
       |FROM r WHERE rn = 1
       |ORDER BY max_cosine DESC, vec_id ASC LIMIT 100""".stripMargin

  // --------------------------------------- north star: embedding-cosine dedup
  /** Embedding-cosine near-duplicate detection — the vector member of the
    * dedup family (exact / MinHash-LSH / SimHash / n-gram Jaccard / THIS):
    * any pair with cosine ≥ 0.4 is a near-dup; each duplicate is assigned to
    * its lowest-id match as canonical (keep-lowest-id survivor convention,
    * same as the exact dedup), deterministically via row_number.
    *
    * This exact form is the correctness baseline (all-pairs, repartitioned
    * across cores like knnBruteForce); at 100 TB the identical
    * threshold+canonical logic runs over `knnLshBucketed`-style bucketed
    * candidates instead of the all-pairs join — same downstream operators,
    * swapped candidate generator.
    */
  def dedupEmbeddingCosine(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    guardAllPairs(spark, Tables.embeddings(spark, sf).select(col("vec_id")), "dedup_embedding_cosine")
    val e = Tables
      .embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), sqrt(dot(col("embedding"), col("embedding"))).as("norm"))
    val a = Det.spreadSmallScan(spark,
      e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("norm").as("norm_a")))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("norm").as("norm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(
        col("vec_a"),
        col("vec_b"),
        (dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b"))).as("cosine"))
      .where(col("cosine") >= 0.4)
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(col("vec_b")).orderBy(col("vec_a").asc)))
      .where(col("rn") === 1)
      .select(col("vec_b").as("dup_id"), col("vec_a").as("canonical_id"), col("cosine"))
      .orderBy(col("dup_id"))
  }

  val dedupEmbeddingCosineSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings
       |), pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cosine
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id
       |)
       |SELECT vec_b AS dup_id, vec_a AS canonical_id, cosine FROM (
       |  SELECT vec_a, vec_b, cosine,
       |    row_number() OVER (PARTITION BY vec_b ORDER BY vec_a ASC) AS rn
       |  FROM pairs WHERE cosine >= 0.4)
       |WHERE rn = 1 ORDER BY dup_id""".stripMargin

  // ------------------------------------- north star: embedding dedup, LSH path
  /** [[dedupEmbeddingCosine]]'s 100 TB twin, registered rather than merely
    * documented: the SAME threshold + canonical-assignment semantics, but
    * candidates come from the 4-table sign-bucket LSH equi-join instead of
    * the all-pairs cross join — the swap a production corpus makes. The
    * cosine on every surviving pair is EXACT (same fold, same norms); only
    * candidate recall is approximate, so every emitted (dup, canonical,
    * cosine) row is also a true ≥-threshold pair of the exact operator
    * (ExtrasSpec pins that subset property plus a recall floor).
    */
  def dedupEmbeddingLsh(spark: SparkSession, sf: String): DataFrame =
    // cosine computed IN the bucket join's projection (see lshScoredPairs);
    // the ≥-threshold filter runs BEFORE the distinct, so the only full
    // shuffle of this query carries the few true near-dup pairs, not the
    // 250·n candidate stream. A pair colliding in several tables yields
    // bit-identical cosines (same fold, same inputs), so distinct is exact.
    lshDedupPost(lshScoredPairs(spark, sf))

  /** Shared scored-pairs → (dup, canonical, cosine) tail of both embedding
    * LSH dedup queries: exact cosine, ≥ 0.4 filter BEFORE the one narrow
    * distinct, keep-lowest-id canonical per duplicate.
    */
  private def lshDedupPost(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored
      .select(
        col("vec_a"),
        col("vec_b"),
        (dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b"))).as("cosine"))
      .where(col("cosine") >= 0.4)
      .distinct()
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(col("vec_b")).orderBy(col("vec_a").asc)))
      .where(col("rn") === 1)
      .select(col("vec_b").as("dup_id"), col("vec_a").as("canonical_id"), col("cosine"))
      .orderBy(col("dup_id"))
  }

  /** The REGISTERED skew-defense twin: [[dedupEmbeddingLsh]]'s exact tail
    * over [[lshBucketTableEqualMass]]'s histogram-binned buckets. On the
    * (measured-uniform) fixture data the two bucketings produce the same
    * near-dup verdicts through different candidate sets; on a biased
    * corpus this is the plan that keeps occupancy — and therefore pair
    * work — pinned at the target (SkewSpec's biased-corpus measurement).
    * The oracle mirrors the histogram/cumulative-mass arithmetic exactly,
    * so the query is hash-checked end to end like its radix sibling.
    */
  def dedupEmbeddingLshEqualMass(spark: SparkSession, sf: String): DataFrame =
    lshDedupPost(lshScoredPairsOf(lshBucketTableEqualMass(Tables.embeddings(spark, sf))))

  val dedupEmbeddingLshEqualMassSql: String =
    s"""WITH p AS (
       |  SELECT LEAST(65536, GREATEST(16, CAST(CEIL(COUNT(*) / $LshTargetOccupancy) AS INT))) AS nb,
       |    COUNT(*) AS n
       |  FROM embeddings
       |), vs AS (
       |  SELECT vec_id, tt.t AS t,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(16 * tt.t + 1, 16 * tt.t + 17),
       |        i -> CAST(CASE WHEN embedding[i] > 0 THEN 1 ELSE 0 END AS BIGINT))),
       |      (acc, b) -> acc * 2 + b) AS s
       |  FROM embeddings CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS t) tt
       |), binned AS (
       |  SELECT h.t, h.s,
       |    CAST(FLOOR(COALESCE(SUM(h.c) OVER (
       |      PARTITION BY h.t ORDER BY h.s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * p.nb / p.n) AS BIGINT) AS bkt
       |  FROM (SELECT t, s, COUNT(*) AS c FROM vs GROUP BY t, s) h, p
       |), bt AS (
       |  SELECT vs.vec_id, vs.t, binned.bkt FROM vs JOIN binned USING (t, s)
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bt a JOIN bt b ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id
       |), e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings
       |), pairs AS (
       |  SELECT cand.vec_a, cand.vec_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cosine
       |  FROM cand
       |  JOIN e a ON a.vec_id = cand.vec_a
       |  JOIN e b ON b.vec_id = cand.vec_b
       |)
       |SELECT vec_b AS dup_id, vec_a AS canonical_id, cosine FROM (
       |  SELECT vec_a, vec_b, cosine,
       |    row_number() OVER (PARTITION BY vec_b ORDER BY vec_a ASC) AS rn
       |  FROM pairs WHERE cosine >= 0.4)
       |WHERE rn = 1 ORDER BY dup_id""".stripMargin

  val dedupEmbeddingLshSql: String =
    s"""WITH cand AS (
       |  $lshCandidateUnionSql
       |), e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings
       |), pairs AS (
       |  SELECT cand.vec_a, cand.vec_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cosine
       |  FROM cand
       |  JOIN e a ON a.vec_id = cand.vec_a
       |  JOIN e b ON b.vec_id = cand.vec_b
       |)
       |SELECT vec_b AS dup_id, vec_a AS canonical_id, cosine FROM (
       |  SELECT vec_a, vec_b, cosine,
       |    row_number() OVER (PARTITION BY vec_b ORDER BY vec_a ASC) AS rn
       |  FROM pairs WHERE cosine >= 0.4)
       |WHERE rn = 1 ORDER BY dup_id""".stripMargin

  // ------------------------------------------------- north star: LSH buckets
  /** Multi-table LSH approximate kNN: 4 hash tables, each bucketing on the
    * sign pattern of 4 dimensions (axis-aligned hyperplane LSH over dims
    * 1–16); candidates = pairs sharing a bucket in ANY table (union-
    * distinct), then exact dot re-rank, top-20.
    *
    * Tuning measured on this data (sf0.001, vs brute force): 1×8-bit
    * table → recall@20 0.05; 4×4-bit tables → recall@20 0.55 at 23% of
    * the brute-force pair count. Candidate generation stays an equi-join
    * on the bucket key — the scalable shape; more tables buy recall
    * linearly in cost without ever going all-pairs.
    *
    * All 4 hash tables ride ONE exploded (table, bucket) stream through a
    * single self-join on (t, bkt) — measured 1.13 s vs 1.41–2.06 s for
    * the per-table 4-join + union-distinct form it replaced (identical
    * output); at scale that is one bucket-keyed shuffle instead of four
    * join stages plus a union.
    */
  /** The oracle twin of [[lshCandidatePairs]] — ONE definition consumed by
    * both LSH oracles, so a bucketing change can never make the two
    * registered queries disagree on candidate generation.
    */
  // def, not val: dedupEmbeddingLshSql above interpolates this during
  // object init, and a val declared later would still be null at that point
  //
  // Bucket count per table is ADAPTIVE and SMOOTH (round-8; the round-7
  // form adapted a PREFIX BIT count, whose 2^b bucket counts stair-step —
  // occupancy oscillated ×2 across each boundary and the measured local
  // exponent between two fixture scales swung 1.3–2.1 with it). Each
  // table owns a FIXED 16-dimension slice (4 tables × 16 = all 64 dims);
  // a vector's 16 sign bits read as a binary integer s (first dimension =
  // HIGH bit), and its bucket is the RADIX bin floor(s·nb / 2^16) with
  // nb = clamp(⌈n/125⌉, 16, 65536) — buckets are contiguous sign-prefix
  // ranges (locality identical in kind to prefix bits, granularity now
  // interpolating BETWEEN bit widths), expected occupancy pinned at ~125
  // at every n. At the fixture SFs (n ≤ 2000) nb floors at 16, so each
  // bucket is exactly a 4-bit sign prefix of the table's slice. The
  // count is computed IN-PLAN (a 1-row aggregate, broadcast), not
  // driver-side, so the static SQL twin applies the identical integer
  // arithmetic (s·nb < 2^32 — exact in BIGINT/long everywhere). Past
  // n ≈ 125·2^16 ≈ 8 M vectors per partition-group you'd switch to
  // random-hyperplane projections (sign bits no longer bounded by dims) —
  // at that scale this whole query runs per corpus shard anyway.
  // defs, not vals, for the same init-order reason as lshCandidateUnionSql
  private def LshTargetOccupancy = 125.0
  private def lshNbSql: String =
    s"SELECT LEAST(65536, GREATEST(16, CAST(CEIL(COUNT(*) / $LshTargetOccupancy) AS INT))) AS nb FROM embeddings"
  private[queries] def lshCandidateUnionSql: String = {
    def bucketExpr(t: Int) =
      s"CAST(FLOOR(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(range(${16 * t + 1}, ${16 * t + 17}), " +
        s"i -> CAST(CASE WHEN embedding[i] > 0 THEN 1 ELSE 0 END AS BIGINT))), " +
        s"(acc, b) -> acc * 2 + b) * p.nb / 65536.0) AS BIGINT)"
    (0 until 4)
      .map(t =>
        s"SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM " +
          s"(SELECT vec_id, ${bucketExpr(t)} AS bkt FROM embeddings, ($lshNbSql) p) a JOIN " +
          s"(SELECT vec_id, ${bucketExpr(t)} AS bkt FROM embeddings, ($lshNbSql) p) b " +
          s"ON a.bkt = b.bkt AND a.vec_id < b.vec_id")
      .mkString("\n  UNION\n  ")
  }

  /** The exploded (vec_id, embedding, norm, t, bkt) bucket table of the 4
    * LSH hash tables — the EXACT bucketing [[lshScoredPairs]] self-joins.
    * The embedding (and its norm, computed once per vector BEFORE the
    * 4-way explode) rides along so the self-join emits pairs already
    * carrying both sides' vectors — the r9 restructure that removed the
    * post-candidate attach joins (see [[lshScoredPairs]]). Exposed
    * private[graft] so tools/LshOccupancy measures the shipped scheme
    * itself, never a re-derivation that could drift from it.
    */
  private[graft] def lshBucketTable(spark: SparkSession, sf: String): DataFrame =
    lshBucketTableOf(Tables.embeddings(spark, sf))

  private[graft] def lshBucketTableOf(e: DataFrame): DataFrame = {
    // 1-row aggregate, broadcast onto every row: the same adaptive-bits
    // formula the SQL twin computes (see lshNbSql).
    val params = e.agg(
      least(lit(65536), greatest(lit(16), ceil(count(lit(1)) / LshTargetOccupancy)))
        .cast("long").as("nb"))
    // radix bin of the table's 16-bit sign integer — see the adjacent
    // lshCandidateUnionSql scaladoc for the scheme and its bounds
    def bucketFor(t: Int) = floor(
      aggregate(
        transform(
          sequence(lit(16 * t + 1), lit(16 * t + 16)),
          i => when(element_at(col("embedding"), i) > 0f, 1L).otherwise(0L)),
        lit(0L),
        (acc, b) => acc * 2 + b) * col("nb") / lit(65536.0)).cast("long")
    val buckets = array((0 until 4).map(t => struct(lit(t).as("t"), bucketFor(t).as("bkt"))): _*)
    e.crossJoin(broadcast(params))
      .select(
        col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"),
        explode(buckets).as("b"))
      .select(col("vec_id"), col("embedding"), col("norm"), col("b.t").as("t"), col("b.bkt").as("bkt"))
  }

  /** The SKEW-DEFENSE bucket variant: equal-MASS bins computed from the
    * sign-integer histogram instead of equal-WIDTH radix bins.
    *
    * The registered queries use [[lshBucketTableOf]]'s equal-width bins
    * because the fixture sign integers are measured-uniform
    * (docs/LSH_OCCUPANCY.md: i.i.d. unit gaussians ⇒ i.i.d. fair sign
    * bits) and equal-width costs no histogram pass. A REAL corpus is
    * biased — per-dimension sign probabilities far from ½ concentrate the
    * sign-integer distribution, and equal-width bins then inherit the
    * density (occupancy ∝ local mass; SkewSpec constructs a biased corpus
    * where the hottest bin carries > 3× target). This variant bins by
    * CUMULATIVE mass: per table, the (s → count) histogram (≤ 2¹⁶ rows —
    * model-state-sized), a running sum over it, and
    * bucket(s) = ⌊cum_before(s)·nb/n⌋ — contiguous sign-prefix ranges
    * exactly like the radix form (same locality argument), but every
    * bucket holds ≈ n/nb rows REGARDLESS of the distribution; only a
    * single sign-integer hotter than the target can exceed it (those
    * vectors agree on every one of the slice's 16 signs — at that point
    * they are candidates one genuinely wants compared). The histogram
    * pass is one extra bounded aggregate + a broadcast join; at 100 TB
    * both are dwarfed by the pair join they protect. Output schema is
    * identical, so it drops into [[lshScoredPairs]]'s self-join
    * unchanged. Covered by SkewSpec (occupancy restored on the biased
    * corpus; identical candidate semantics on uniform data).
    */
  private[graft] def lshBucketTableEqualMass(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val params = e.agg(
      least(lit(65536), greatest(lit(16), ceil(count(lit(1)) / LshTargetOccupancy)))
        .cast("long").as("nb"),
      count(lit(1)).as("n"))
    def signInt(t: Int) = aggregate(
      transform(
        sequence(lit(16 * t + 1), lit(16 * t + 16)),
        i => when(element_at(col("embedding"), i) > 0f, 1L).otherwise(0L)),
      lit(0L),
      (acc, b) => acc * 2 + b)
    val sints = array((0 until 4).map(t => struct(lit(t).as("t"), signInt(t).as("s"))): _*)
    val vs = e
      .select(
        col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("norm"),
        explode(sints).as("b"))
      .select(col("vec_id"), col("embedding"), col("norm"), col("b.t").as("t"), col("b.s").as("s"))
    // (t, s) histogram — ≤ 4·2¹⁶ rows by construction — then the running
    // mass BEFORE each s (4 bounded window partitions, one per table)
    val wT = Window.partitionBy(col("t")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val binned = vs
      .groupBy(col("t"), col("s")).agg(count(lit(1)).as("c"))
      .withColumn("cum_before", coalesce(sum(col("c")).over(wT), lit(0L)))
      .crossJoin(broadcast(params))
      .select(col("t"), col("s"),
        floor(col("cum_before") * col("nb") / col("n")).cast("long").as("bkt"))
    vs.join(broadcast(binned), Seq("t", "s"))
      .select(col("vec_id"), col("embedding"), col("norm"), col("t"), col("bkt"))
  }

  /** Candidate pairs (vec_a < vec_b, sharing a bucket in ANY of the 4 LSH
    * tables) with BOTH embeddings and norms attached IN the bucket
    * self-join itself — NOT distinct yet (a pair colliding in several
    * tables appears once per collision; callers project to narrow scored
    * columns and distinct those).
    *
    * Round-9 restructure (VERDICT r8 item 1). The measured occupancy
    * artifact (docs/LSH_OCCUPANCY.md) showed buckets FLAT (avg 125, max
    * ≤ 169 across sf0.1/1/3) and candidate volume exactly linear
    * (455 k → 4.96 M → 14.95 M distinct pairs) — skew was NOT the
    * super-linear term. The plan was: the old shape shuffled+sorted the
    * pair stream THREE times (distinct, then two sort-merge joins back to
    * embeddings to fetch the vectors — broadcast at sf1 where the table
    * is 5 MB, a sort-merge cliff at sf3 where 15 MB exceeds the bench's
    * 8 MB threshold). Carrying the 64-float vector through the bucket
    * stream costs one array per exploded row (4n rows ≈ 4× the table —
    * linear, sorted on the tiny (t,bkt) key), and the pair stream that
    * shuffles afterwards is narrow (ids + one double) and shuffles ONCE.
    * Measured: sf3 dedup_embedding_lsh 8.0 → 1.3 s, knn_lsh_bucketed
    * 6.4 → 2.3 s warm (sf1→sf3 exponents 1.52/1.16 → ≤ 1.1).
    */
  private def lshScoredPairs(spark: SparkSession, sf: String): DataFrame =
    lshScoredPairsOf(lshBucketTable(spark, sf))

  /** The same scored self-join over ANY bucket table with the (vec_id,
    * embedding, norm, t, bkt) schema — shared by the equal-width radix
    * queries and the equal-mass skew-defense twin so the pair plan can
    * never diverge between them.
    */
  private def lshScoredPairsOf(tb: DataFrame): DataFrame =
    tb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
        col("norm").as("norm_a"), col("t"), col("bkt"))
      .join(
        tb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
          col("norm").as("norm_b"), col("t"), col("bkt")),
        Seq("t", "bkt"))
      .where(col("vec_a") < col("vec_b"))

  /** Distinct (vec_a < vec_b) candidate pairs — kept for measurement
    * (tools/LshOccupancy's realized-candidate count) and recall specs;
    * the registered queries use [[lshScoredPairs]] directly.
    */
  private[graft] def lshCandidatePairs(spark: SparkSession, sf: String): DataFrame =
    lshScoredPairs(spark, sf)
      .select(col("vec_a"), col("vec_b"))
      .distinct()

  /** Top-20 distinct pairs WITHOUT a full distinct shuffle: a pair appears
    * in at most 4 tables, and its duplicates carry IDENTICAL (dot, vec_a,
    * vec_b) sort keys, so the 20th distinct pair's first copy sits at
    * position ≤ 4·19 + 1 = 77 of the totally-ordered pre-distinct stream —
    * the top-80 rows (a per-partition TakeOrderedAndProject, no shuffle of
    * the 250·n candidate stream) always contain the top-20 distinct pairs;
    * distinct then runs over 80 rows. Measured sf3: 3.6 → 1.3 s warm.
    */
  private def top20DistinctPairs(scored: DataFrame): DataFrame =
    scored
      .orderBy(col("dot").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(80)
      .distinct()
      .orderBy(col("dot").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(20)

  def knnLshBucketed(spark: SparkSession, sf: String): DataFrame =
    // dot computed in the bucket join (lshScoredPairs); see
    // top20DistinctPairs for why no full distinct shuffle is needed
    top20DistinctPairs(
      lshScoredPairs(spark, sf)
        .select(col("vec_a"), col("vec_b"), dot(col("emb_a"), col("emb_b")).as("dot")))

  val knnLshBucketedSql: String = {
    s"""WITH cand AS (
       |  $lshCandidateUnionSql
       |)
       |SELECT cand.vec_a, cand.vec_b,
       |  ${dotSql("a.embedding", "b.embedding")} AS dot
       |FROM cand
       |JOIN embeddings a ON a.vec_id = cand.vec_a
       |JOIN embeddings b ON b.vec_id = cand.vec_b
       |ORDER BY dot DESC, vec_a ASC, vec_b ASC LIMIT 20""".stripMargin
  }

  // ------------------------------------- LSH persisted-index probe regime
  /** The persisted-index regime of [[knnLshBucketed]] (VERDICT r8 item 2):
    * BUILD writes the exploded bucket table — (vec_id, embedding, norm, t,
    * bkt), the exact artifact [[lshScoredPairs]] self-joins and the one a
    * 100 TB deployment ships per corpus version — to parquet ONCE per
    * (sf, source fingerprint); PROBE reads it and runs only the bucket
    * self-join + exact re-rank. Bucketing is deterministic (sign bits +
    * an in-plan count), so output is identical to knn_lsh_bucketed and it
    * registers under the SAME oracle. Reuses the IVF index machinery:
    * source-fingerprinted dir name + staging + atomic rename (a concurrent
    * builder either wins the rename or finds the winner's complete dir).
    */
  def buildLshIndex(spark: SparkSession, sf: String): String =
    buildBucketsIndex(lshIndexDir(sf), lshBucketTable(spark, sf))

  /** Persist any (vec_id, embedding, norm, t, bkt) bucket table as a
    * `buckets/` parquet index at `dir` — the shared build step of the
    * radix ([[buildLshIndex]]) and equal-mass ([[buildLshEqmassIndex]])
    * persisted-index regimes. By-name `tb` so no plan is constructed when
    * the index already exists.
    */
  private def buildBucketsIndex(dir: String, tb: => DataFrame): String = {
    if (new java.io.File(s"$dir/buckets/_SUCCESS").exists()) return dir
    val staging = java.nio.file.Paths.get(
      s"$dir.tmp.${java.lang.ProcessHandle.current().pid()}")
    tb.write.mode("overwrite").parquet(s"$staging/buckets")
    graft.ops.IndexStore.commitAtomically(staging, dir, "buckets/_SUCCESS")
    dir
  }

  /** v1: round-9 bucket-table format (vec_id, embedding, norm, t, bkt). */
  private def lshIndexDir(sf: String): String =
    graft.ops.IndexStore.indexDir("graft_lsh_v1", sf, Tables.path(sf, "embeddings"))

  def knnLshProbe(spark: SparkSession, sf: String): DataFrame = {
    val dir = lshIndexDir(sf)
    val marker = new java.io.File(s"$dir/buckets/_SUCCESS")
    val resolved = if (marker.exists()) dir else buildLshIndex(spark, sf)
    val tb = spark.read.parquet(s"$resolved/buckets")
    top20DistinctPairs(
      tb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("t"), col("bkt"))
        .join(
          tb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("t"), col("bkt")),
          Seq("t", "bkt"))
        .where(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"), dot(col("emb_a"), col("emb_b")).as("dot")))
  }

  /** The persisted-index regime of [[dedupEmbeddingLshEqualMass]] — the
    * registered skew-defense path gets the same train/probe split its
    * radix sibling has ([[knnLshProbe]]): the histogram-binned bucket
    * table — the expensive half on a biased corpus (histogram + running
    * mass + bucket join) — is built and persisted ONCE per (sf, source
    * fingerprint); the probe reads it and runs only the bucket self-join
    * + exact-cosine dedup tail. Binning is deterministic (sign bits + an
    * in-plan histogram of the source data), so output is identical to the
    * in-query form and it registers under the SAME oracle.
    */
  def dedupEmbeddingLshEqmassProbe(spark: SparkSession, sf: String): DataFrame = {
    val dir = lshEqmassIndexDir(sf)
    val resolved =
      if (new java.io.File(s"$dir/buckets/_SUCCESS").exists()) dir
      else buildLshEqmassIndex(spark, sf)
    lshDedupPost(lshScoredPairsOf(spark.read.parquet(s"$resolved/buckets")))
  }

  def buildLshEqmassIndex(spark: SparkSession, sf: String): String =
    buildBucketsIndex(
      lshEqmassIndexDir(sf),
      lshBucketTableEqualMass(Tables.embeddings(spark, sf)))

  /** v1: same (vec_id, embedding, norm, t, bkt) format as the radix index
    * but histogram-binned — the two schemes bucket differently, so each
    * versions under its own root and they can never serve each other.
    */
  private def lshEqmassIndexDir(sf: String): String =
    graft.ops.IndexStore.indexDir("graft_lsh_eqm_v1", sf, Tables.path(sf, "embeddings"))

  // ---------------------------------------------------------------- §2.D9/I9
  /** Per-label centroids, element-wise: posexplode → exact-decimal mean per
    * (label, position). The typed-Aggregator formulation is ScalaTest-
    * covered; this posexplode form is the oracle-checked one because both
    * engines can run the identical math (SURVEY §2.D9).
    * Oracle note: the DuckDB twin hardcodes dim=64 (FIXTURES.md) since
    * DuckDB lacks WITH ORDINALITY; the Spark side is dimension-agnostic.
    */
  /** 2^52 — multiplying a float-precision value by it is an exact exponent
    * shift in double, and the product is an exact integer for any |v| in
    * [2^-29, 2^11). Float→decimal casts are NOT portable (Spark rounds the
    * shortest decimal repr, DuckDB rounds the binary value — they disagree
    * near scale boundaries, measured 4/12800 at scale 10), so centroid sums
    * run in this exact fixed-point domain instead.
    */
  private val Fixed = 4503599627370496.0

  def aggVectorCentroid(spark: SparkSession, sf: String): DataFrame =
    Tables
      .embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(
        (sum((col("v").cast("double") * lit(Fixed)).cast("long").cast("decimal(38,0)"))
          .cast("double") / (count(lit(1)) * lit(Fixed))).as("centroid"),
        count(lit(1)).as("n_vectors"))
      .orderBy(col("label"), col("pos"))

  val aggVectorCentroidSql: String =
    """SELECT label, i AS pos,
      |  CAST(SUM(CAST(CAST(CAST(embedding[i + 1] AS DOUBLE) * 4503599627370496.0 AS BIGINT) AS DECIMAL(38,0)) ) AS DOUBLE)
      |    / (COUNT(*) * 4503599627370496.0) AS centroid,
      |  COUNT(*) AS n_vectors
      |FROM embeddings, (SELECT unnest(range(64)) AS i) dims
      |GROUP BY label, i ORDER BY label, pos""".stripMargin

  // ----------------------------------------------------- north star: IVF
  /** IVF approximate nearest neighbors over DETERMINISTIC k-means cells.
    *
    * Round-2's cells were per-LABEL centroids — but labels here are not a
    * geometric partition (measured: only 3–20% of true top-3 neighbors
    * share the query's label across SFs), capping recall@3 at 0.30. These
    * cells are geometric: k ADAPTIVE coarse centroids trained by k-means
    * with every source of nondeterminism pinned — init = the embeddings of
    * the k lowest vec_ids, exactly 2 Lloyd iterations, assignment argmax by
    * (dot DESC, cell ASC), and means in the exact 2^52 fixed-point domain
    * (the aggVectorCentroid machinery) so Spark and the oracle compute
    * bit-identical centroids. Empty cells simply drop out (both engines
    * group only non-empty cells). Measured recall@3 vs brute force:
    * 0.83–0.90 across sf0.001/0.01 (k = 8 there; probe-2 = 1/4 of the
    * corpus probed); the ExtrasSpec floor pins ≥ 0.6 at sf0.001.
    *
    * ADAPTIVE k (the round-7 sf1 scale proof's one super-linear survivor,
    * fixed with the LSH adaptive-bits template): a fixed k means cell
    * occupancy n/k grows linearly with the corpus, so dedup_semantic's
    * within-cell pair join — Σ cell² ≈ k·(n/k)² = n²/k — grows
    * QUADRATICALLY (measured ×13.5/×25.7 at the 10× scale factor). k now
    * targets constant occupancy, the same 125-row target the LSH bucket
    * family uses: k = clamp(ceil(n / 125), 8, 4096). Pair work becomes
    * 125·n — linear until the 4096-cell cap (n ≈ 512k; past it, train on
    * a sample and shard the corpus per cell range). The formula is
    * computed IN-PLAN (a 1-row aggregate broadcast onto the init rows) so
    * the static SQL oracle applies the identical arithmetic — no literal
    * baked at registration time can diverge from the data. At
    * sf0.001/0.01 (n = 500) the clamp floors k at 8, so small-sf results,
    * recall measurements, and the persisted-index artifacts are unchanged
    * from the fixed-k rounds. The assignment pass costs n·k dots; at the
    * occupancy target that is n²/125 asymptotically, which the cell cap
    * bounds in practice (≤ 4096·n) — the classical IVF train-on-a-sample
    * posture applies long before that matters at 100 TB.
    *
    * Scale posture unchanged: training at 100 TB runs on a sample (cells
    * are a tiny k×dim table either way); the corpus side only ever
    * equi-joins on its assigned cell id — the inverted file — and each
    * query cross-joins the broadcast k-row cell table, never the corpus.
    * Query set = vec_id < 10; top-3 per query.
    */
  private val IvfMaxCells = 4096
  private val IvfIters = 2

  /** Training-sample size per cell (round-8, VERDICT r7 item 3): the Lloyd
    * iterations run on the m = min(n, [[TrainSamplePerCell]]·k) LOWEST
    * vec_ids instead of the full corpus — the classical IVF
    * train-on-a-sample posture (25 training points per centroid is ample
    * for a coarse quantizer; faiss warns below ~39). The SAMPLE is what
    * bounds training: the 2 Lloyd assignment passes drop from 2·n·k to
    * 2·m·k dots, and the per-(cell,pos) centroid recompute from 2·64·n to
    * 2·64·m rows. The one remaining n·k pass is the FINAL corpus
    * assignment — the inverted file itself, the exact artifact a
    * production build pays once and the *_probe twins amortize away.
    * The predicate `vec_id < m` is deterministic, in-plan (both m and k
    * come from the same 1-row broadcast aggregate), and mirrored verbatim
    * in the oracle CTEs; the generated corpora use contiguous vec_ids
    * 0..n-1, so it selects exactly the m lowest ids.
    */
  private val TrainSamplePerCell = 25

  /** The in-plan adaptive cell count + training-sample bound: 1 row,
    * columns `k` and `m`. Oracle twin: [[ivfKSql]]. Occupancy target
    * shared with [[LshTargetOccupancy]].
    */
  private def ivfKParams(emb: DataFrame): DataFrame =
    emb.agg(
      least(lit(IvfMaxCells), greatest(lit(8), ceil(count(lit(1)) / lit(LshTargetOccupancy))))
        .cast("int").as("k"),
      count(lit(1)).as("n"))
      .select(col("k"),
        least(col("n"), lit(TrainSamplePerCell.toLong) * col("k")).cast("int").as("m"),
        ceil(sqrt(col("k"))).cast("int").as("g"))

  private def ivfKSql: String =
    s"SELECT k, CAST(LEAST(n, $TrainSamplePerCell * k) AS INT) AS m, " +
      s"CAST(CEIL(SQRT(k)) AS INT) AS g FROM (" +
      s"SELECT LEAST($IvfMaxCells, GREATEST(8, CAST(CEIL(COUNT(*) / $LshTargetOccupancy) AS INT))) AS k, " +
      s"COUNT(*) AS n FROM embeddings)"

  /** One Lloyd step: argmax-assign every vector to `cells` (cell, cvec),
    * then recompute exact fixed-point means per cell. Returns (cell, cvec).
    *
    * The argmax is a `max_by` HASH AGGREGATE, not a row_number window: the
    * crossJoin emits n·k scored rows IN the scan's own partitions, so
    * map-side partial aggregation collapses them back to n rows before any
    * exchange — the window form shuffled and sorted all n·k rows, each
    * carrying the full embedding array, and was the dominant cost of
    * adaptive-k training (measured 62 s for ann_ivf at sf1/k=160; the
    * max_by + vec_dot form retires it). Tie-break (dot DESC, cell ASC) is
    * encoded as max over struct(ec_dot, -cell) — identical to the window's
    * ordering and to the oracle's row_number.
    */
  /** FLAT scoring (vector × every cell) — used only where the source is
    * SMALL: the Lloyd training sample (m = 25·k rows). Flat is one
    * broadcast join + one aggregate (≈ 4 stages/step); routing the sample
    * through the two-level hierarchy saved dots but cost ~10 extra
    * sub-second STAGES per step, and at sf1 the measured wall time was
    * ~0.1–0.2 s of scheduler floor per stage, not compute (52-stage
    * attribution in docs/BENCH_NOTES.md). The full-corpus final
    * assignment is where n·k bites, and it uses [[scoredCells]].
    */
  private def scoredCellsFlat(src: DataFrame, cells: DataFrame): DataFrame =
    src
      .crossJoin(broadcast(cells.select(col("cell"), col("cvec"))))
      .select(col("vec_id"), col("cell"), dot(col("embedding"), col("cvec")).as("ec_dot"))

  private def kmeansStep(emb: DataFrame, cells: DataFrame): DataFrame = {
    val assigned = scoredCellsFlat(emb, cells)
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("ec_dot"), (-col("cell")).as("nc"))).as("cell"))
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("cell"), col("embedding"))
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum((col("v").cast("double") * lit(Fixed)).cast("long").cast("decimal(38,0)"))
        .cast("double") / (count(lit(1)) * lit(Fixed))).as("centroid"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, centroid))), s -> s.centroid)")
        .as("cvec"))
  }

  /** IVF approximate nearest neighbors: deterministic k-means coarse
    * quantizer (adaptive k — see ivfKParams — 2 Lloyd iterations), probe-2
    * search. Recall@3 0.83–0.90 vs brute force (ExtrasSpec floor 0.6).
    *
    * COST ATTRIBUTION (bench): ~1.5 s of this query's wall time is the
    * k-means TRAINING (2 Lloyd steps, each a broadcast-assign + fixed-point
    * mean recompute, materialized via localCheckpoint) re-run on every
    * call — by design. A production deployment trains the quantizer and
    * builds the inverted file ONCE per corpus version and persists both
    * (exactly the localCheckpoint boundaries below); steady-state query
    * cost is only the probe join. The bench number is therefore
    * train+build+query end-to-end, not amortized query latency — documented
    * in docs/BENCH_NOTES.md rather than hidden by caching model state
    * across bench iterations (which would measure neither regime honestly).
    */
  /** Trained coarse quantizer: k deterministic k-means cells (cell, cvec),
    * k adaptive (see the IVF scaladoc above). init: cell i = embedding of
    * the i-th lowest vec_id (float→double per element — exact), i = 1..k.
    * orderBy().limit() plans as TakeOrderedAndProject (per-partition
    * top-k, no global sort) with the CONSTANT cell cap as the literal
    * bound; the adaptive k then trims the capped result via the broadcast
    * 1-row params aggregate — limit() needs a literal, the filter does
    * not. The row_number window below runs over ≤ IvfMaxCells rows only —
    * bounded by construction.
    */
  /** params is the (already materialized — see [[quantizerParams]]) 1-row
    * k/m/g aggregate; each Lloyd iteration is localCheckpoint'ed (k rows ×
    * 64 doubles — model state), truncating the lineage so step i+1's
    * multiple references to step i's cells (super window, cell-routing
    * join, scoring join) execute it once, not once per reference. This is
    * the spark.ml KMeans shape: materialize centroids every iteration.
    */
  private def trainCells(emb: DataFrame, params: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val init = emb
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id"))
      .limit(IvfMaxCells)
      .withColumn("cell", row_number().over(Window.orderBy(col("vec_id"))))
      .crossJoin(broadcast(params))
      .where(col("cell") <= col("k"))
      .select(col("cell"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cvec"))
    // Lloyd iterations over the deterministic training SAMPLE (vec_id < m,
    // m broadcast from the same 1-row params aggregate) — see
    // [[TrainSamplePerCell]]. The seeds (k lowest vec_ids) are inside the
    // sample by construction, so every cell starts with ≥ 1 member.
    // materialized once: both Lloyd steps consume it, and un-checkpointed
    // each step re-ran the corpus scan + sample filter as its own stages
    val sample = emb
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(params.select(col("m"))))
      .where(col("vec_id") < col("m"))
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    (1 to IvfIters).foldLeft(init.localCheckpoint())((c, _) =>
      kmeansStep(sample, c).localCheckpoint())
  }

  /** The materialized quantizer params: a 1-row aggregate referenced by
    * every hierarchy stage (init trim, sample filter, super selection per
    * Lloyd step, final routing). Un-checkpointed, each broadcast of it
    * re-ran the corpus count as its own job — ~6 jobs of pure machinery
    * per query (measured ~0.4 s at sf1).
    */
  private def quantizerParams(emb: DataFrame): DataFrame =
    ivfKParams(emb).localCheckpoint()

  /** ONE top-2 assignment pass serves both index sides: rank-1 rows form
    * the inverted file for every corpus vector, rank ≤ 2 rows of the query
    * subset are its probes — the k-means chain and its broadcast are
    * planned once instead of twice.
    *
    * Top-2 via collect_list + array_sort + slice inside one HASH AGGREGATE
    * (same map-side-combine argument as [[kmeansStep]]'s max_by: the n·k
    * scored rows collapse to n in place of the old window's full n·k
    * shuffle-and-sort). The per-vector list holds k (nd, cell) structs —
    * ≤ 16 bytes each, bounded by IvfMaxCells — and sorting ascending on
    * (nd = -dot, cell) IS the window's (dot DESC, cell ASC) order.
    */
  private def assignTop2(emb: DataFrame, cells: DataFrame, params: DataFrame): DataFrame = {
    scoredCells(emb, cells, params)
      .groupBy(col("vec_id"))
      .agg(
        slice(
          array_sort(collect_list(struct((-col("ec_dot")).as("nd"), col("cell")))),
          1, 2).as("top2"))
      .select(col("vec_id"), posexplode(col("top2")).as(Seq("pos", "best")))
      .select(
        col("vec_id"),
        (col("pos") + 1).cast("int").as("rn"),
        col("best.cell").as("cell"))
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("rn"), col("cell"), col("vec_id"), col("embedding"))
  }

  /** TWO-LEVEL (hierarchical) cell scoring — round-8, VERDICT r7 item 3's
    * exponent fix. The flat form scored every vector against every cell
    * (n·k dots); with the occupancy-targeted k ∝ n that is n²/125 —
    * measured e ≈ 1.8–2.1 sf1→sf3 for the in-query quantizer family. The
    * classical IVF answer is a coarse-over-coarse hierarchy (IMI/two-level
    * quantizer): group the k cells under g = ⌈√k⌉ SUPER-cells, route each
    * vector to its top-2 supers, and score it only against the cells of
    * those supers — n·(g + 2k/g) ≈ 4√k per vector instead of k
    * (sf3: 66 vs 480 dots/vector). Asymptotically n^1.5 with k ∝ n; the
    * remaining growth is the inverted-file build itself, which the
    * *_probe twins amortize to e ≤ 1.12.
    *
    * Determinism: super-centroids are the g lowest-id cells; every argmax
    * tie-breaks (dot DESC, id ASC); all mirrored CTE-for-CTE in the
    * oracle ([[supCte]]/[[csupCte]]/[[vsupCte]]). The assignment is
    * APPROXIMATE exactly like the quantizer it builds (a vector whose
    * true nearest cell lives outside its two nearest supers gets its best
    * in-super cell instead) — recall@3 vs brute force re-measured in
    * ExtrasSpec (floor 0.6 unchanged).
    *
    * Plan shape: two broadcast passes (g-row and k-row tables are model
    * state), one n-row co-partitioned self-join to attach each vector's
    * super routes, then the bounded fan-out join — still only THREE
    * narrow columns wide (same argument as the flat form: the 64-element
    * embedding is read for the vec_dot, never copied into the scored
    * stream).
    */
  private def scoredCells(emb: DataFrame, cells: DataFrame, params: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // g lowest-id cells as super-centroids (window over ≤ IvfMaxCells rows)
    val sup = cells
      .withColumn("r", row_number().over(Window.orderBy(col("cell"))))
      .crossJoin(broadcast(params.select(col("g"))))
      .where(col("r") <= col("g"))
      .select(col("cell").as("sc"), col("cvec").as("svec"))
    // each cell under its nearest super (k×g dots — model-state-sized).
    // A super's OWN cell is pinned to itself (the leading `self` rank
    // key): under inner product a cell does not necessarily win its own
    // argmax, so without the pin a super could own zero cells and a
    // vector whose top-2 supers were both empty would get no candidate
    // cells at all — silently dropped from the inverted file (ADVICE r8).
    // With the pin every super owns ≥ 1 cell, so every routed vector has
    // ≥ 1 candidate. Mirrored in the oracle ([[csupCte]]).
    val csup = cells
      .crossJoin(broadcast(sup))
      .select(col("cell"), col("cvec"), col("sc"), dot(col("cvec"), col("svec")).as("cs_dot"))
      .groupBy(col("cell"))
      .agg(max_by(col("sc"), struct(
        (col("cell") === col("sc")).cast("int").as("self"),
        col("cs_dot"), (-col("sc")).as("ns"))).as("sc"))
      .join(cells.select(col("cell"), col("cvec")), "cell")
    // each vector's top-2 supers (n·g dots, collapsed map-side)
    val vsup = emb
      .crossJoin(broadcast(sup))
      .select(col("vec_id"), col("sc"), dot(col("embedding"), col("svec")).as("vs_dot"))
      .groupBy(col("vec_id"))
      .agg(slice(array_sort(collect_list(struct((-col("vs_dot")).as("nd"), col("sc")))), 1, 2).as("t2"))
      .select(col("vec_id"), explode(expr("transform(t2, s -> s.sc)")).as("sc"))
    // candidate cells = cells of the routed supers (n·2k/g dots expected)
    emb
      .join(vsup, "vec_id")
      .join(broadcast(csup), "sc")
      .select(col("vec_id"), col("cell"), dot(col("embedding"), col("cvec")).as("ec_dot"))
  }

  /** Probe-2 search over a materialized top-2 assignment table. */
  private def probeAssigned(assigned2: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inverted = assigned2
      .where(col("rn") === 1)
      .select(col("cell"), col("vec_id"), col("embedding"))
    val probed = assigned2
      .where(col("rn") <= 2 && col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("cell"))
    // probed is ≤ 20 rows BY CONSTRUCTION (vec_id < 10, rn ≤ 2) at every
    // scale, but a checkpointed assignment table carries no useful size
    // estimate, so the planner sort-merge-joined it — shuffling and
    // sorting the corpus-sized inverted file by cell (r14 plan dump;
    // ann_ivf_probe's parquet-backed twin already got the BHJ from
    // stats). The explicit broadcast pins the scale-correct shape: the
    // inverted file never shuffles, the probe relation ships.
    broadcast(probed)
      .join(inverted, Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("dot", dot(col("qemb"), col("embedding")))
      .withColumn(
        "rank",
        row_number().over(Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("vec_id").asc)))
      .where(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id").as("neighbor"), col("dot"))
      .orderBy(col("qid"), col("rank"))
  }

  def annIvf(spark: SparkSession, sf: String): DataFrame = {
    val emb = Tables.embeddings(spark, sf)
    // Materialize the trained cells (k rows × dim doubles — model state,
    // not data): iterative training lineage otherwise re-executes once per
    // downstream consumer (measured: 8 parquet scans / 23 windows in the
    // un-truncated plan). localCheckpoint is the idiomatic Spark move for
    // iterative refinement — spark.ml's own KMeans materializes centroids
    // every iteration. ann_ivf_probe persists the same two boundaries as
    // parquet — the production artifact split.
    val params = quantizerParams(emb)
    val cells = trainCells(emb, params)
    // ... and the assignment table is materialized too: it IS the IVF
    // index (cell → members), the artifact a production system persists
    // once per corpus; without this its two consumers below re-run the
    // assignment pass each.
    val assigned2 = assignTop2(emb, cells, params).localCheckpoint()
    probeAssigned(assigned2)
  }

  /** The persisted-index regime of [[annIvf]] (VERDICT r5 item 3): BUILD
    * writes the trained cells and the top-2 assignment table — the coarse
    * quantizer and the inverted file, the two artifacts a 100 TB
    * deployment ships per corpus version — to parquet ONCE per (sf,
    * library version); PROBE reads the assignment table and runs only the
    * probe-2 join. Identical output to ann_ivf (training is fully
    * deterministic), so it registers under the SAME oracle; the bench line
    * for this query is steady-state query latency, while ann_ivf's stays
    * train+build+query end-to-end.
    */
  def buildIvfIndex(spark: SparkSession, sf: String): String = {
    val dir = ivfIndexDir(sf)
    // The dir name embeds a source-data fingerprint and only a COMPLETE
    // index can appear at it (atomic rename below), so an existing index
    // is the one this build would produce — training is deterministic.
    if (new java.io.File(s"$dir/assigned/_SUCCESS").exists()) return dir
    // Build into a staging dir, then ATOMIC-rename into place (ADVICE r6):
    // a concurrent JVM building the same index either wins the rename or
    // finds the winner's complete directory — no reader ever sees a
    // half-written index.
    val staging = java.nio.file.Paths.get(
      s"$dir.tmp.${java.lang.ProcessHandle.current().pid()}")
    val emb = Tables.embeddings(spark, sf)
    val params = quantizerParams(emb)
    val cells = trainCells(emb, params)
    cells.write.mode("overwrite").parquet(s"$staging/cells")
    assignTop2(emb, cells, params).write.mode("overwrite").parquet(s"$staging/assigned")
    graft.ops.IndexStore.commitAtomically(staging, dir, "assigned/_SUCCESS")
    dir
  }

  /** Index location: one directory per (scale-factor dir, SOURCE-DATA
    * fingerprint) under the JVM temp root — [[graft.ops.IndexStore]]'s
    * staleness contract. The version tag marks the index FORMAT — bump it
    * when the training recipe changes.
    */
  private def ivfIndexDir(sf: String): String =
    // v5: round-9 recipe — v4 (train-on-sample Lloyd + two-level routed
    // assignment) plus the self-pinned cell→super mapping (ADVICE r8: no
    // empty supers). Older indexes would serve assignments computed under
    // the unpinned routing.
    graft.ops.IndexStore.indexDir("graft_ivf_v5", sf, Tables.path(sf, "embeddings"))

  def annIvfProbe(spark: SparkSession, sf: String): DataFrame = {
    val dir = ivfIndexDir(sf)
    val marker = new java.io.File(s"$dir/assigned/_SUCCESS")
    val resolved = if (marker.exists()) dir else buildIvfIndex(spark, sf)
    probeAssigned(spark.read.parquet(s"$resolved/assigned"))
  }

  /** Oracle-side dot of a float list against a double centroid list — the
    * identical left fold the Spark side uses. Shared by the annIvf and
    * dedupSemantic oracles (both unroll the same deterministic k-means).
    */
  private def cellDot(vec: String, cvec: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($vec) + 1), " +
      s"i -> CAST($vec[i] AS DOUBLE) * $cvec[i])), (acc, x) -> acc + x)"

  // ---- two-level (super-cell) routing CTE builders — the oracle twins of
  // [[scoredCells]]'s hierarchy; every argmax tie-breaks (dot DESC, id ASC)

  /** Super-centroids: the g lowest-id cells of cellsRel. */
  private def supCte(cellsRel: String): String =
    s"""SELECT cell AS sc, cvec AS svec FROM (
       |    SELECT cell, cvec, row_number() OVER (ORDER BY cell) AS r FROM $cellsRel), ($ivfKSql) p
       |  WHERE r <= p.g""".stripMargin

  /** Each cell under its nearest super (cvec carried along); a super's own
    * cell pins to itself — the leading CASE rank key, mirroring
    * [[scoredCells]]'s `self` field (ADVICE r8: guarantees no empty super).
    */
  private def csupCte(cellsRel: String, supRel: String): String =
    s"""SELECT cell, cvec, sc FROM (
       |    SELECT c.cell, c.cvec, s.sc,
       |      row_number() OVER (PARTITION BY c.cell ORDER BY
       |        (CASE WHEN c.cell = s.sc THEN 1 ELSE 0 END) DESC,
       |        ${cellDot("c.cvec", "s.svec")} DESC, s.sc ASC) AS rc
       |    FROM $cellsRel c CROSS JOIN $supRel s)
       |  WHERE rc = 1""".stripMargin

  /** Each vector of srcRel routed to its top-2 supers. */
  private def vsupCte(srcRel: String, supRel: String): String =
    s"""SELECT vec_id, sc FROM (
       |    SELECT e.vec_id, s.sc,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cellDot("e.embedding", "s.svec")} DESC, s.sc ASC) AS rs
       |    FROM $srcRel e CROSS JOIN $supRel s)
       |  WHERE rs <= 2""".stripMargin

  /** Rank-1 FLAT assignment (every cell scored) — the Lloyd-step twin of
    * [[scoredCellsFlat]], used over the small training sample only.
    */
  private def assignCteFlat(cellsRel: String, srcRel: String): String =
    s"""SELECT cell, vec_id, embedding FROM (
       |    SELECT c.cell, e.vec_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cellDot("e.embedding", "c.cvec")} DESC, c.cell ASC) AS rn
       |    FROM $srcRel e CROSS JOIN $cellsRel c)
       |  WHERE rn = 1""".stripMargin

  /** Rank-1 assignment over the routed candidate cells (vsupRel gives each
    * vector's ≤ 2 supers; csupRel maps cells to supers).
    */
  private def assignCte(csupRel: String, vsupRel: String, srcRel: String): String =
    s"""SELECT cell, vec_id, embedding FROM (
       |    SELECT cs.cell, e.vec_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cellDot("e.embedding", "cs.cvec")} DESC, cs.cell ASC) AS rn
       |    FROM $srcRel e JOIN $vsupRel v ON v.vec_id = e.vec_id JOIN $csupRel cs ON cs.sc = v.sc)
       |  WHERE rn = 1""".stripMargin

  private def centCte(assignRel: String): String =
    s"""SELECT cell, list(centroid ORDER BY pos) AS cvec FROM (
       |    SELECT cell, i AS pos,
       |      CAST(SUM(CAST(CAST(CAST(embedding[i + 1] AS DOUBLE) * 4503599627370496.0 AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE)
       |        / (COUNT(*) * 4503599627370496.0) AS centroid
       |    FROM $assignRel, (SELECT unnest(range(64)) AS i) dims
       |    GROUP BY cell, i)
       |  GROUP BY cell""".stripMargin

  /** The unrolled 2-Lloyd-step k-means CTE chain (cells0 → cells2), ending
    * with the trained quantizer relation `cells2`. The oracle twin of
    * [[trainCells]].
    */
  private def kmeansCellsCtes: String =
    s"""cells0 AS (
       |  SELECT cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec FROM (
       |    SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding FROM embeddings),
       |    ($ivfKSql) p
       |  WHERE cell <= p.k
       |), train_sample AS (
       |  -- the deterministic Lloyd training sample: the m lowest vec_ids,
       |  -- m = min(n, 25·k) from the same adaptive params (Spark twin:
       |  -- trainCells' vec_id < m broadcast filter)
       |  SELECT e.vec_id, e.embedding FROM embeddings e, ($ivfKSql) p
       |  WHERE e.vec_id < p.m
       |), assign1 AS (
       |  ${assignCteFlat("cells0", "train_sample")}
       |), cells1 AS (
       |  ${centCte("assign1")}
       |), assign2 AS (
       |  ${assignCteFlat("cells1", "train_sample")}
       |), cells2 AS (
       |  ${centCte("assign2")}
       |), sup2 AS (
       |  ${supCte("cells2")}
       |), csup2 AS (
       |  ${csupCte("cells2", "sup2")}
       |), vsup2 AS (
       |  ${vsupCte("embeddings", "sup2")}
       |)""".stripMargin

  val annIvfSql: String = {
    // the oracle unrolls the same 2 Lloyd steps as CTE pairs; dot products
    // are the identical left fold, means the identical fixed-point form
    s"""WITH $kmeansCellsCtes, assigned2 AS (
       |  SELECT rn, cell, vec_id, embedding FROM (
       |    SELECT cs.cell, e.vec_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cellDot("e.embedding", "cs.cvec")} DESC, cs.cell ASC) AS rn
       |    FROM embeddings e JOIN vsup2 v ON v.vec_id = e.vec_id JOIN csup2 cs ON cs.sc = v.sc)
       |  WHERE rn <= 2
       |), inverted AS (
       |  SELECT cell, vec_id, embedding FROM assigned2 WHERE rn = 1
       |), probed AS (
       |  SELECT vec_id AS qid, embedding AS qemb, cell FROM assigned2 WHERE vec_id < 10
       |), cand AS (
       |  SELECT p.qid, e.vec_id AS neighbor,
       |    ${dotSql("p.qemb", "e.embedding")} AS dot
       |  FROM probed p JOIN inverted e ON e.cell = p.cell AND e.vec_id <> p.qid
       |)
       |SELECT qid, rank, neighbor, dot FROM (
       |  SELECT qid, neighbor, dot,
       |    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, neighbor ASC) AS rank
       |  FROM cand)
       |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  // ------------------------------------------------------ semantic dedup
  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    * cluster the embedding space with the SAME deterministic k-means
    * coarse quantizer the IVF index trains, then search for near-duplicate
    * pairs only WITHIN each cluster — cosine ≥ 0.4, the library-wide
    * near-dup threshold — and drop every vector that has a lower-id
    * near-neighbor (keep-lowest-id survivor, the dedup family convention).
    * Output: one row per DROPPED vector with its cluster, its canonical
    * keeper (lowest matching lower id) and its lower-id near-dup count.
    *
    * Scale posture: this is the semantic analog of dedup_embedding_lsh —
    * the pair space shrinks from n² to Σ cell², with the cluster key as
    * the ONE shuffle key; the cluster assignment is the same artifact the
    * IVF index persists (buildIvfIndex), so a 100 TB deployment amortizes
    * training across both ANN search and dedup. Unlike the LSH variant
    * (random-hyperplane buckets can split a true near-dup pair across
    * buckets), k-means cells follow the data's density, which is why
    * SemDeDup clusters rather than hashes.
    */
  def dedupSemantic(spark: SparkSession, sf: String): DataFrame = {
    val emb = Tables.embeddings(spark, sf)
    val params = quantizerParams(emb)
    val cells = trainCells(emb, params)
    // Top-2 multi-probe membership, exactly like the IVF search side: a
    // near-dup pair is examined if the two vectors share EITHER of their
    // two closest cells. Single-assignment recall at small cell counts is
    // poor (measured 0.31 at sf0.001 — boundary pairs split); probe-2
    // recovers it the same way it lifts IVF recall@3 to 0.83+.
    // materialize the top-2 assignment (the IVF index artifact, skinny
    // rows): semanticFromAssigned joins it to ITSELF (pair sides a and b),
    // and un-checkpointed the whole two-level routing chain executed twice
    // (round-8 plan audit: 16 shuffles -> 8)
    semanticFromAssigned(assignTop2(emb, cells, params).localCheckpoint(),
      shuffleHash = true)
  }

  /** The persisted-quantizer regime of [[dedupSemantic]] (VERDICT r6 item
    * 2): reuses the SAME on-disk top-2 assignment table the IVF index
    * ships ([[buildIvfIndex]] — one training run amortized across ANN
    * search and semantic dedup, the SemDeDup deployment shape), so only
    * the within-cell pair join runs per call. Training is deterministic,
    * so output is identical and it registers under the same oracle.
    */
  def dedupSemanticProbe(spark: SparkSession, sf: String): DataFrame = {
    val dir = ivfIndexDir(sf)
    val marker = new java.io.File(s"$dir/assigned/_SUCCESS")
    val resolved = if (marker.exists()) dir else buildIvfIndex(spark, sf)
    semanticFromAssigned(spark.read.parquet(s"$resolved/assigned"))
  }

  /** Within-cell near-dup search over a top-2 assignment table — the
    * shared tail of [[dedupSemantic]] (in-query training) and
    * [[dedupSemanticProbe]] (persisted index).
    */
  private def semanticFromAssigned(assigned2: DataFrame, shuffleHash: Boolean = false): DataFrame = {
    val member = assigned2
      .withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))
    val a = member.select(
      col("cell"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("norm").as("norm_a"))
    val b = member.select(
      col("cell"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("norm").as("norm_b"))
    // shuffleHash: the in-query regime's input is a checkpointed RDD with
    // no size stats, so the planner falls back to SortMergeJoin — sorting
    // BOTH corpus-sized pair sides by cell. Cell occupancy is bounded by
    // the quantizer's occupancy targeting (k ∝ n/125), so per-partition
    // hash relations are even and bounded — the shuffled-hash regime
    // (guide §3.1). Tax-adjusted A/B at sf1, two pairs each way:
    // SMJ 3.37/3.38 vs SHJ 3.05/2.98 (≈ −10%; BENCH_NOTES §49). The
    // PROBE path keeps planner choice: its parquet input has stats, picks
    // a broadcast at fixture scales (forcing the hint there read +12%),
    // and a deployment's AQE can still demote SMJ→SHJ at runtime.
    //
    // LOCAL-HARNESS GATED (r15, ADVICE r14 item 2): the bounded-occupancy
    // argument assumes the quantizer keeps cells even; on real data a
    // pathologically hot cell makes the SHJ build side a whole partition
    // of a skewed table — the OOM regime where SMJ degrades gracefully —
    // and an explicit hint also overrides AQE's runtime choice. The hint
    // therefore applies only under Det.SpreadConf (set by the local
    // bench/profile/test harness mains, never by library callers), so a
    // cluster deployment keeps planner + AQE choice on this join.
    val localHarness = assigned2.sparkSession.conf
      .getOption(Det.SpreadConf).exists(_.toBoolean)
    val bSide = if (shuffleHash && localHarness) b.hint("shuffle_hash") else b
    a.join(bSide, Seq("cell"))
      .where(col("vec_a") < col("vec_b"))
      .where(dot(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b")) >= 0.4)
      // a pair sharing both probe cells appears twice — countDistinct, not
      // count, and the grouping collapses the duplicates
      .groupBy(col("vec_b"))
      .agg(min(col("vec_a")).as("kept_by"), countDistinct(col("vec_a")).as("n_lower_dups"))
      .select(col("vec_b").as("vec_id"), col("kept_by"), col("n_lower_dups"))
      .orderBy(col("vec_id"))
  }

  val dedupSemanticSql: String =
    s"""WITH $kmeansCellsCtes, member AS (
       |  SELECT cell, vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM (
       |    SELECT cs.cell, e.vec_id, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cellDot("e.embedding", "cs.cvec")} DESC, cs.cell ASC) AS rn
       |    FROM embeddings e JOIN vsup2 v ON v.vec_id = e.vec_id JOIN csup2 cs ON cs.sc = v.sc)
       |  WHERE rn <= 2
       |)
       |SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS kept_by,
       |  COUNT(DISTINCT a.vec_id) AS n_lower_dups
       |FROM member a JOIN member b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE ${dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm) >= 0.4
       |GROUP BY b.vec_id
       |ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------- quantization
  /** L2-normalize + symmetric int8 quantization of the embedding column —
    * the storage/ANN-index preprocessing step (a quantized corpus is 4×
    * smaller and dot products run in integer SIMD downstream). Per-row
    * projection, zero shuffles before the output sort: the norm is the
    * same left-fold the dot products use (float→double exact), and
    * round-half-up on identical doubles agrees between both engines.
    * |x| ≤ ‖v‖ guarantees every quantized value lands in [-127, 127]
    * (pinned in ExtrasSpec).
    */
  def embeddingQuantize(spark: SparkSession, sf: String): DataFrame =
    Det.spreadSmallScan(spark, Tables.embeddings(spark, sf))
      .withColumn(
        "norm",
        sqrt(expr("aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .select(
        col("vec_id"), col("norm"),
        // comma-joined string, not array<int>: the oracle-compare surface
        // serializes every array column to a string (same discipline as
        // agg_collect_sorted / array_setops) — int→string is exact in
        // both engines
        // norm = 0 → all-zero qvec (same guard as knnQuantized; ADVICE r8)
        concat_ws(",",
          expr("transform(embedding, x -> IF(norm = 0D, '0', CAST(CAST(round(CAST(x AS DOUBLE) / norm * 127.0) AS INT) AS STRING)))"))
          .as("qvec"))
      // the per-vector norm + int8 transform must not run twice for the
      // sort sampler (r12 sweep) — see Det.sortBarrier
      .transform(Det.sortBarrier(col("vec_id")))
      .orderBy(col("vec_id"))

  val embeddingQuantizeSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (acc, x) -> acc + x)) AS norm
      |  FROM embeddings
      |)
      |SELECT vec_id, norm,
      |  array_to_string(list_transform(embedding,
      |    x -> CASE WHEN norm = 0 THEN CAST(0 AS INT)
      |      ELSE CAST(round(CAST(x AS DOUBLE) / norm * 127.0) AS INT) END), ',') AS qvec
      |FROM n ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------- cluster topics
  /** Topic profile of the embedding space: assign every vector to its
    * k-means cell (the SAME adaptive-k quantizer the IVF index and
    * semantic dedup train), join the matching documents (vec_id = doc_id
    * — the corpus subset that has embeddings), and report each cell's
    * top-3 tokens by LIFT = p(token | cell) / p(token), computed over the
    * embedded subset. This is the corpus-cartography step: a human-
    * readable label per cluster, the sanity check that semantic dedup's
    * cells mean something — and at deployment the assignment is the
    * persisted IVF artifact, so the profile costs one tokenize + three
    * token-keyed aggregations on top of an index that already exists.
    *
    * Lift arithmetic: both factors are cast to double BEFORE multiplying
    * (overflow-safe at any corpus size; identical parenthesization both
    * engines). The top-3 window runs per cell over the vocabulary-bounded
    * (cell, token) table, never the token stream.
    */
  def clusterTopics(spark: SparkSession, sf: String): DataFrame = {
    val emb = Tables.embeddings(spark, sf)
    val params = quantizerParams(emb)
    val cells = trainCells(emb, params)
    val inv = scoredCells(emb, cells, params)
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("ec_dot"), (-col("cell")).as("nc"))).as("cell"))
      // materialize the (vec_id, cell) assignment — it IS the persisted
      // IVF artifact the probe twin reads from parquet, and it keeps the
      // routing chain out of topicsFromAssignment's plan (r14: the token
      // stream now feeds ONE aggregation, ctc, but ctc's own eager
      // materialization would otherwise re-run the routing inside its job)
      .localCheckpoint()
    topicsFromAssignment(spark, sf, inv)
  }

  /** The persisted-quantizer regime of [[clusterTopics]] (same pattern as
    * [[annIvfProbe]] / [[dedupSemanticProbe]]): reads the on-disk top-2
    * assignment the IVF index ships and keeps only rank-1 rows, so the
    * per-call cost is the tokenize + three token-keyed aggregations.
    * Training is deterministic, so output is identical — same oracle.
    */
  def clusterTopicsProbe(spark: SparkSession, sf: String): DataFrame = {
    val dir = ivfIndexDir(sf)
    val marker = new java.io.File(s"$dir/assigned/_SUCCESS")
    val resolved = if (marker.exists()) dir else buildIvfIndex(spark, sf)
    val inv = spark.read.parquet(s"$resolved/assigned")
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cell"))
    topicsFromAssignment(spark, sf, inv)
  }

  /** Shared tail of [[clusterTopics]] / [[clusterTopicsProbe]]: token lift
    * profile over a (vec_id, cell) assignment.
    */
  private def topicsFromAssignment(spark: SparkSession, sf: String, inv: DataFrame,
      topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The explicit isNotNull pair is a data-level no-op (cell is a routed
    // int, token survives `<> ''`) that mirrors the constraints the lift
    // joins below infer into ONLY the main stream's copy of this subtree —
    // without it the four consumers' exchanges no longer canonicalize
    // equal and the tokenize Generate re-runs per consumer (the
    // BENCH_NOTES §40/§42 reuse-trap class).
    val toks = inv
      .join(Tables.documents(spark, sf).select(col("doc_id"), TextOps.tokensCol.as("t")),
        col("doc_id") === col("vec_id"))
      .select(col("cell"), explode(col("t")).as("token"))
      .where(col("token") =!= "" && col("cell").isNotNull && col("token").isNotNull)
    // ONE pass over the token stream: nc / ct / nt are exact integer
    // re-aggregations of ctc (Σ c_tc over tokens per cell = the cell's
    // token count, etc. — the same derive-from-the-finest-aggregate move
    // bigram_lm_score's c1-from-c2 made in r11). The r8 form aggregated
    // toks four times, and the plan ran the tokenize+explode Generate
    // once per aggregate (4 full passes over the embedded corpus's token
    // stream — r14 plan dump); the three derived aggregates instead
    // re-shuffle the vocabulary-bounded (cell, token) table, and all four
    // consumers read the ONE (cell, token)-keyed exchange (ReusedExchange
    // ×3 in the plan).
    // ctc is MATERIALIZED (localCheckpoint, the house pattern for bounded
    // intermediate tables): its four consumers below cannot share the
    // (cell, token) exchange through canonicalization because the inv
    // side is a checkpointed RDD scan whose partitioning metadata carries
    // branch-local expression ids (r14 plan dump: four byte-identical
    // subtrees, zero ReusedExchange), so plan-level reuse is the fragile
    // path here and the eager one-job materialization is the robust one.
    val ctc = toks.groupBy(col("cell"), col("token")).agg(count(lit(1)).as("c_tc"))
      .localCheckpoint()
    val nc = ctc.groupBy(col("cell")).agg(sum(col("c_tc")).as("n_c"))
    val ct = ctc.groupBy(col("token")).agg(sum(col("c_tc")).as("c_t"))
    val nt = ctc.agg(sum(col("c_tc")).as("n_tot"))
    val lift = (col("c_tc").cast("double") * col("n_tot")) /
      (col("n_c").cast("double") * col("c_t"))
    ctc
      .join(broadcast(nc), Seq("cell"))
      .join(broadcast(ct), Seq("token"))
      .crossJoin(broadcast(nt))
      .withColumn("lift", lift)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("lift").desc, col("token").asc)))
      .where(col("rank") <= topN)
      .select(col("cell").cast("long").as("cell"), col("rank").cast("long").as("rank"),
        col("token"), col("c_tc"), col("lift"))
      .orderBy(col("cell"), col("rank"))
  }

  val clusterTopicsSql: String =
    s"""WITH $kmeansCellsCtes, inv AS (
       |  SELECT cell, vec_id FROM (
       |    SELECT cs.cell, e.vec_id,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cellDot("e.embedding", "cs.cvec")} DESC, cs.cell ASC) AS rn
       |    FROM embeddings e JOIN vsup2 v ON v.vec_id = e.vec_id JOIN csup2 cs ON cs.sc = v.sc)
       |  WHERE rn = 1
       |), toks AS (
       |  SELECT i.cell, token FROM inv i JOIN (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents) d
       |  ON d.doc_id = i.vec_id
       |  WHERE token <> ''
       |), ctc AS (SELECT cell, token, COUNT(*) AS c_tc FROM toks GROUP BY cell, token
       |), nc AS (SELECT cell, COUNT(*) AS n_c FROM toks GROUP BY cell
       |), ct AS (SELECT token, COUNT(*) AS c_t FROM toks GROUP BY token
       |), nt AS (SELECT COUNT(*) AS n_tot FROM toks)
       |SELECT cell, rank, token, c_tc, lift FROM (
       |  SELECT ctc.cell, token, c_tc,
       |    (CAST(c_tc AS DOUBLE) * n_tot) / (CAST(n_c AS DOUBLE) * c_t) AS lift,
       |    row_number() OVER (PARTITION BY ctc.cell ORDER BY
       |      (CAST(c_tc AS DOUBLE) * n_tot) / (CAST(n_c AS DOUBLE) * c_t) DESC, token ASC) AS rank
       |  FROM ctc JOIN nc USING (cell) JOIN ct USING (token) CROSS JOIN nt)
       |WHERE rank <= 3 ORDER BY cell, rank""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("knn_brute_force", knnBruteForce _, knnBruteForceSql),
    ("knn_quantized", knnQuantized _, knnQuantizedSql),
    ("cosine_topk", cosineTopk _, cosineTopkSql),
    ("contamination_semantic", contaminationSemantic _, contaminationSemanticSql),
    ("dedup_embedding_cosine", dedupEmbeddingCosine _, dedupEmbeddingCosineSql),
    ("dedup_embedding_lsh", dedupEmbeddingLsh _, dedupEmbeddingLshSql),
    ("dedup_embedding_lsh_eqmass", dedupEmbeddingLshEqualMass _, dedupEmbeddingLshEqualMassSql),
    // identical deterministic output by construction — same oracle
    ("dedup_embedding_lsh_eqmass_probe", dedupEmbeddingLshEqmassProbe _, dedupEmbeddingLshEqualMassSql),
    ("knn_lsh_bucketed", knnLshBucketed _, knnLshBucketedSql),
    // identical deterministic output by construction — same oracle
    ("knn_lsh_probe", knnLshProbe _, knnLshBucketedSql),
    ("agg_vector_centroid", aggVectorCentroid _, aggVectorCentroidSql),
    ("ann_ivf", annIvf _, annIvfSql),
    // identical deterministic output by construction — same oracle
    ("ann_ivf_probe", annIvfProbe _, annIvfSql),
    ("embedding_quantize", embeddingQuantize _, embeddingQuantizeSql),
    ("dedup_semantic", dedupSemantic _, dedupSemanticSql),
    // identical deterministic output by construction — same oracle
    ("dedup_semantic_probe", dedupSemanticProbe _, dedupSemanticSql),
    ("cluster_topics", clusterTopics _, clusterTopicsSql),
    // identical deterministic output by construction — same oracle
    ("cluster_topics_probe", clusterTopicsProbe _, clusterTopicsSql)
  )
}
