package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2.J). Every transform here takes
  * a DataFrame that may be batch OR streaming — the ScalaTest suite runs
  * each one both ways (file source → memory sink vs plain batch) and
  * asserts identical results, which is the correctness argument for the
  * streaming path.
  *
  * Event time arrives as timestamp_ntz from graft.Tables; watermarks need
  * TimestampType, so callers use [[withEventTime]] first (UTC session makes
  * the cast wall-clock-preserving).
  */
object StreamOps {

  /** One event row as the typed views need it (ts in epoch micros to stay
    * encoder-friendly across batch/streaming).
    */
  case class Event(event_id: Long, user_id: Long, event_type: String, value: Double)

  /** A detected change: the reference's hash-compare loop as a stream. */
  case class Change(user_id: Long, event_id: Long, prev_type: String, new_type: String)

  /** Cast the ntz event time to TimestampType for watermark use. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts", col("ts").cast("timestamp"))

  // ---------------------------------------------------------------- §2.J1
  /** Tumbling 1-hour counts — works unchanged on batch and stream. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("hour_start"), col("n_events"))

  /** J1 with watermark (required for append-mode streaming aggregation). */
  def tumblingHourlyWatermarked(events: DataFrame): DataFrame =
    tumblingHourly(events.withWatermark("ts", "1 hour"))

  // ---------------------------------------------------------------- §2.J3
  /** Session windows with a 30-minute gap, per user. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  // ---------------------------------------------------------------- §2.J5
  /** Streaming dedup by event_id bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  // ------------------------------------------------- composed EP pipeline
  /** The reference lifecycle (clean → dedup → report) as ONE streaming
    * query: drop failed fetches, dedupe replays by event_id inside the
    * watermark, aggregate hourly counts AND the hourly value total (exact
    * decimal sum, cast to double — the same order-independent money math
    * as the batch operators, so streaming merge order can't change the
    * result). Each stage is incremental; state is bounded by the watermark
    * (dedup) and the window (agg) — the shape that runs forever on an
    * unbounded source. STREAMING ONLY: dropDuplicatesWithinWatermark
    * throws on batch input; the batch twin substitutes
    * dropDuplicates("event_id") — StreamingSpec pins the two equal on the
    * same data.
    */
  def cleanDedupProfile(events: DataFrame): DataFrame =
    events
      .where(col("event_type") =!= "error")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("hour_start"), col("n_events"), col("total_value"))

  // ------------------------------------------------- drift monitor (obs)
  /** The in-stream half of the event-mix drift monitor: hourly per-type
    * counts with a watermark — bounded state (one count per open window ×
    * type), append-able once the watermark passes. The χ² alerting job
    * (graft.queries.StreamShaped.streamDriftChi2) runs over this
    * monitor's sink; splitting the statistic out of the stream keeps the
    * streaming query single-aggregation (no chained stateful operators)
    * and lets the alert re-weigh history without replaying the stream.
    */
  def driftObs(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("obs"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("obs"))

  /** Streaming count-min sketch maintenance — the incremental form of
    * [[graft.queries.EventAnalytics.sketchCountminHh]]'s build half, over
    * any frame with a `user_id` column. The defining property of the
    * sketch is exactly what a streaming aggregation needs: state is AT
    * MOST 4096 (depth, bucket) counters NO MATTER how many distinct keys
    * the unbounded stream carries — a streaming groupBy(user_id) grows
    * state per distinct user forever, this cannot. No watermark, by
    * design: nothing is ever evicted because nothing needs to be; the
    * sketch is a corpus-lifetime frequency structure. Cells come from the
    * shared [[graft.queries.EventAnalytics.cmsCells]], so the maintained
    * matrix is bit-identical to the batch build on the same prefix
    * (StreamingSpec pins it per micro-batch).
    */
  def cmsMaintain(keys: DataFrame): DataFrame =
    keys
      .select(graft.queries.EventAnalytics.cmsCells(col("user_id")).as("e"))
      .groupBy(col("e.d").as("d"), col("e.b").as("b"))
      .agg(count(lit(1)).as("n"))

  // ---------------------------------------------------------------- §2.J7
  /** Stream–stream interval join: each click joins the same user's view
    * events from the preceding 30 minutes (attribution). BOTH sides carry
    * a watermark and the join condition bounds view_ts relative to
    * click_ts from both directions — exactly what Spark requires to evict
    * join state: a view older than click watermark − 30 min can never
    * match again and is dropped, so state is bounded on an unbounded
    * stream. Batch twin: the same join condition on static frames
    * (StreamingSpec pins them equal).
    */
  def clickViewAttribution(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    c.join(
        v,
        col("user_id") === col("v_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("view_id"), col("click_ts"), col("view_ts"))
  }

  // ---------------------------------------------------------------- §2.J6
  /** Arbitrary stateful processing: emit a row whenever a user's
    * event_type differs from their previous one — the reference's
    * changed-page detection as a stream. State per key is just the last
    * type (O(1)); batch-equivalent is the lag() formulation
    * (window_lag_change_detect).
    */
  def changeDetect(events: Dataset[(Long, Event)]): Dataset[Change] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[String, Change](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Event)], state: GroupState[String]) =>
          // micro-batch iterators carry no order guarantee: order by event_id
          val ordered = rows.map(_._2).toSeq.sortBy(_.event_id)
          var prev = state.getOption
          val out = ordered.flatMap { e =>
            val change = prev match {
              case Some(p) if p != e.event_type =>
                Some(Change(userId, e.event_id, p, e.event_type))
              case _ => None
            }
            prev = Some(e.event_type)
            change
          }
          state.update(prev.getOrElse(""))
          out.iterator
      }
  }

  /** [[changeDetect]] on Spark 4's transformWithState API — the successor
    * to flatMapGroupsWithState (typed ValueState handles, RocksDB-backed
    * state store). Same semantics, same O(1) per-key state; the test suite
    * asserts it matches both the fMGWS version and the batch lag() twin.
    */
  class TypeChangeProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Event), Change] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var lastType: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastType = getHandle.getValueState[String]("lastType", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Event)],
        timerValues: TimerValues): Iterator[Change] = {
      val ordered = rows.map(_._2).toSeq.sortBy(_.event_id)
      var prev = Option(lastType.get())
      val out = ordered.flatMap { e =>
        val change = prev match {
          case Some(p) if p != e.event_type => Some(Change(key, e.event_id, p, e.event_type))
          case _ => None
        }
        prev = Some(e.event_type)
        change
      }
      prev.foreach(lastType.update)
      out.iterator
    }
  }

  /** changeDetect via transformWithState (requires the RocksDB state store
    * provider — set spark.sql.streaming.stateStore.providerClass).
    */
  def changeDetectTws(events: Dataset[(Long, Event)]): Dataset[Change] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_._1)
      .transformWithState(new TypeChangeProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin of [[changeDetect]] for the equivalence test. */
  def changeDetectBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    events
      .select(
        col("user_id"),
        col("event_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        col("event_type").as("new_type"))
      .where(col("prev_type").isNotNull && col("prev_type") =!= col("new_type"))
  }

  // --------------------------------------- §2.L′ streaming line-df twin
  /** Per-line state for [[lineBoilerMaintain]]: whether any document has
    * contained the line yet, which one was first (meaningful only when
    * `seen`), and whether the line has already crossed the boilerplate
    * threshold (emitted exactly once). `seen` is an explicit flag — an
    * in-band sentinel doc id would misclassify a corpus that legitimately
    * uses that id value.
    */
  case class LineDf(seen: Boolean, firstDoc: Long, boiler: Boolean)

  /** Incremental line-df maintenance — the streaming twin of the batch
    * `line_dedup_rebuild` operator's boilerplate detection (VERDICT r8
    * item 7: the one §2.L family without an incremental form). Documents
    * stream in; each is segmented into the SAME 8-token lines as the
    * batch operator ([[graft.queries.Refinery.docLines]] — shared code,
    * so the two can never segment differently), and a line is emitted the
    * moment a SECOND distinct document contains it — the df ≥ 2
    * boilerplate condition, maintained incrementally. The emitted set
    * after any prefix of the stream equals the batch operator's
    * `boiler` set over the same documents (StreamingSpec pins equality,
    * including lines whose two documents arrive in different
    * micro-batches), and each line is emitted EXACTLY once.
    *
    * State is O(1) per distinct line (two fields — no document list: the
    * df ≥ 2 threshold only needs the first doc's identity and a saturated
    * flag), keyed and parallel over line_text. A production deployment
    * whose line space is unbounded adds a state TTL (boilerplate within a
    * horizon) or the [[bloomDedup]] sharded-sketch pattern; NoTimeout here
    * matches the batch twin's cumulative-corpus semantics. Works on batch
    * frames too (flatMapGroupsWithState runs with empty state), which IS
    * the batch twin used in the spec.
    *
    * The rebuild half of line_dedup_rebuild stays batch: a line turning
    * boilerplate RETROACTIVELY edits already-emitted documents, so the
    * streaming stage's job is to maintain the boilerplate list (this
    * operator — the sink a periodic rebuild job joins against), not to
    * re-emit rebuilt documents.
    */
  def lineBoilerMaintain(docs: DataFrame): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    graft.queries.Refinery.docLines(docs)
      .select(col("line_text"), col("doc_id")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LineDf, String](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (line: String, rows: Iterator[(String, Long)], state: GroupState[LineDf]) =>
          var st = state.getOption.getOrElse(LineDf(seen = false, 0L, boiler = false))
          val out = scala.collection.mutable.ListBuffer.empty[String]
          rows.foreach { case (_, doc) =>
            if (!st.boiler) {
              if (!st.seen) st = LineDf(seen = true, doc, boiler = false)
              else if (st.firstDoc != doc) { st = st.copy(boiler = true); out += line }
            }
          }
          state.update(st)
          out.iterator
      }
      .toDF("line_text")
  }

  // ------------------------------------- §2.L′ streaming MinHash-LSH twin
  /** Incremental MinHash-LSH near-duplicate detection — the streaming twin
    * of the batch `dedup_minhash_lsh` operator (the last dedup-family
    * member without an incremental form; exact and Bloom-screened dedup
    * got theirs in rounds 6–8). Documents stream in; each computes its 4
    * LSH band hashes per row via [[graft.queries.TextOps.minhashBands]]
    * (the SAME md5 signature math as the batch operator, restated as a
    * shuffle-free projection — a streaming groupBy would hold per-doc
    * aggregate state forever for a one-shot signature), and state lives
    * per (band, band_hash) BUCKET: the doc ids seen in that bucket, capped
    * at `bucketCap`. A new arrival emits one candidate row per stored
    * neighbour — so after any stream prefix the emitted (doc_a, doc_b,
    * band) set equals the batch band self-join over the same documents
    * (StreamingSpec pins set equality, including pairs whose two docs
    * arrive in different micro-batches), each collision emitted exactly
    * once.
    *
    * Scale posture: state is O(min(bucket size, bucketCap)) longs per
    * DISTINCT band hash — the same ≈ uniform-bucket assumption the batch
    * plan's equi-join already rests on. The cap is the skew defense a
    * boilerplate-heavy real corpus needs (one viral paragraph = one hot
    * bucket): past `bucketCap` docs, a bucket stores no more members, so
    * a hot bucket emits ≤ cap·(arrivals) pairs instead of arrivals² —
    * bounded state AND bounded output, at the documented cost that
    * pairs BOTH of whose docs arrive after the cap are missed (the df-cap
    * trade `dedup_ngram_jaccard` makes batch-side). Production horizons
    * add a state TTL; NoTimeout here matches the batch twin's
    * cumulative-corpus semantics.
    */
  def minhashDedupStream(docs: DataFrame, bucketCap: Int = 64): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    graft.queries.TextOps
      .minhashBands(docs)
      .select(col("band"), col("band_hash"), col("doc_id"))
      .as[(Int, String, Long)]
      .groupByKey { case (band, h, _) => (band, h) }
      .flatMapGroupsWithState[Array[Long], (Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[(Int, String, Long)], state: GroupState[Array[Long]]) =>
          var members = state.getOption.getOrElse(Array.empty[Long])
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Int)]
          rows.foreach { case (band, _, doc) =>
            // a re-delivered doc (source replay) is already a member: emit
            // nothing again, or the exactly-once collision contract breaks.
            // (A replay of a PAST-cap arrival is indistinguishable from a
            // first arrival — the documented cap trade.)
            if (!members.contains(doc)) {
              members.foreach { other =>
                out += ((math.min(other, doc), math.max(other, doc), band))
              }
              if (members.length < bucketCap) members = members :+ doc
            }
          }
          state.update(members)
          out.iterator
      }
      .toDF("doc_a", "doc_b", "band")
  }

  // --------------------------- streaming exact-substring screen twin
  /** Incremental exact-substring duplicate screening — the streaming twin
    * of the batch `dedup_exact_substring` CANDIDATE stage (the contract is
    * the candidate pair, exactly as [[minhashDedupStream]]'s is; the
    * 50-gram confirm join and survivor rule remain downstream batch steps
    * over the pair stream). State lives per seed-hash BUCKET: the ids of
    * docs whose STRIDE-ALIGNED seeds landed there — the persisted-index
    * regime's index side, accumulated incrementally — while every arriving
    * doc probes with ALL its seed positions. The q-gram partition argument
    * makes this single direction complete: a doc sharing a ≥50-token run
    * with any EARLIER doc always hits that doc's stride-aligned seed via
    * one of its own all-position seeds — precisely the incremental-ingest
    * question ("does the new shard duplicate the committed corpus?").
    *
    * Pre-batch semantics like [[noveltyScreenStream]]: probes are judged
    * against bucket membership as of the batch's START, then the batch's
    * index entries are added — same-batch pairs are deliberately not
    * emitted (they are the committed corpus' own batch dedup problem) and
    * output is row-order deterministic; StreamingSpec pins set equality
    * with a strictly-earlier-batch reference across micro-batch splits.
    * A pair sharing several seed buckets emits once per bucket (the
    * minhash per-band shape); consumers dedup. `bucketCap` is the hot
    * boilerplate-seed defense — bounded state AND bounded output per
    * bucket — the same documented trade as [[minhashDedupStream]]'s.
    */
  def exactSubstringScreenStream(docs: DataFrame, bucketCap: Int = 64): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    graft.queries.TextOps.substrSeedStream(docs)
      .as[(Long, String, Boolean)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String, Boolean)], state: GroupState[Array[Long]]) =>
          val members = state.getOption.getOrElse(Array.empty[Long])
          val batch = rows.toList
          val out = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
          batch.map(_._1).distinct.foreach { d =>
            members.foreach { e =>
              if (e != d) out += ((math.min(e, d), math.max(e, d)))
            }
          }
          var m = members
          batch.filter(_._3).map(_._1).distinct.foreach { d =>
            if (!m.contains(d) && m.length < bucketCap) m = m :+ d
          }
          state.update(m)
          out.iterator
      }
      .toDF("doc_a", "doc_b")
  }

  // --------------------------------------- streaming novelty screen twin
  /** Continuous n-gram novelty screening — the streaming twin of
    * [[graft.queries.Retrieval.ngramNoveltyProbe]]'s held-out
    * memorization screen: documents stream in, and each of a document's
    * distinct 3-gram shingles (per-row dedup, the shared
    * [[graft.queries.TextOps.distinctShinglesPerRow]] definition) is
    * emitted with an `unseen` verdict — true iff NO document in any
    * EARLIER micro-batch contained that shingle. Per-doc novelty (the
    * unseen share) is one ordinary aggregation over this verdict stream,
    * downstream — the operator's contract is the per-shingle verdict,
    * exactly as [[minhashDedupStream]]'s is the candidate pair, not the
    * cluster.
    *
    * Semantics are PRE-BATCH deliberately: every row of a micro-batch is
    * judged against the state as of the batch's start (the whole group's
    * rows share one verdict, then the shingle is marked), so the output
    * is deterministic regardless of row order inside the group iterator —
    * two docs introducing the same shingle in the same batch BOTH score
    * it unseen, matching the batch twin "reference = strictly earlier
    * batches" (StreamingSpec pins the equivalence across batch splits).
    *
    * Scale posture: state is one boolean per DISTINCT shingle — the same
    * unbounded-key caveat [[lineBoilerMaintain]] documents; a production
    * horizon adds a state TTL, or trades exactness for the
    * [[bloomDedup]] sharded-sketch pattern (probe-negative ⇒ genuinely
    * unseen, no false "novel" verdicts ever — Bloom's one-sided error
    * points the safe way for a contamination screen).
    */
  def noveltyScreenStream(docs: DataFrame): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    graft.queries.TextOps.distinctShinglesPerRow(docs)
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (Long, String, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sh: String, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          val seenBefore = state.getOption.getOrElse(false)
          val out = rows.map { case (doc, _) => (doc, sh, !seenBefore) }.toList
          state.update(true)
          out.iterator
      }
      .toDF("doc_id", "sh", "unseen")
  }

  // ------------------------------------------- §2.J5′ bloom-state dedup
  /** Streaming dedup with BOUNDED state for an UNBOUNDED key space — the
    * production pattern when `dropDuplicates` can't hold every key:
    * watermarked dedup (§2.J5) bounds state by the time horizon, but a
    * truly unbounded horizon (dedup against all history) would grow the
    * exact key store forever. Here each of `shards` state groups holds ONE
    * fixed-size Bloom filter (spark.util.sketch, serialized into
    * GroupState); a row is emitted iff its key is definitely-new (probe
    * negative — Bloom has no false negatives, so no duplicate is EVER
    * emitted twice); at the built fpp a never-seen key may be wrongly
    * dropped — the standard, documented trade for state that stays
    * `shards × sketch_size` bytes forever, independent of stream length.
    *
    * Sharding by key-hash keeps the operator parallel (state keyed by
    * shard id, `shards` concurrent groups) and each shard's filter sized
    * for capacity/shards keys. At 100 TB/day scale this is the shape of
    * every "have we crawled this URL before" / "is this doc hash new"
    * stream screen.
    */
  def bloomDedup(
      events: Dataset[(Long, Event)],
      shards: Int = 32,
      capacityPerShard: Long = 1 << 20,
      fpp: Double = 0.01): Dataset[Event] = {
    import events.sparkSession.implicits._
    import org.apache.spark.util.sketch.BloomFilter
    events
      .groupByKey { case (key, _) => ((key % shards) + shards) % shards }
      .flatMapGroupsWithState[Array[Byte], Event](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Event)], state: GroupState[Array[Byte]]) =>
          val bloom = state.getOption
            .map(b => BloomFilter.readFrom(b))
            .getOrElse(BloomFilter.create(capacityPerShard, fpp))
          // SINGLE streaming pass (ADVICE r6: the earlier
          // rows.toSeq.sortBy materialized + sorted the whole shard batch
          // on one task's heap): the keep-lowest-event-id survivor
          // convention only needs the MIN event per definitely-new key, so
          // track that in a map keyed by the batch's NEW keys. Peak memory
          // is O(new keys in batch), never O(batch rows) — duplicate rows
          // are dropped as they stream by. (Residual assumption, now
          // explicit: one shard's NEW-key set for one micro-batch fits an
          // executor heap; size `shards` to the micro-batch, not the
          // stream.)
          val newMin = scala.collection.mutable.LongMap.empty[Event]
          rows.foreach { case (key, e) =>
            if (!bloom.mightContainLong(key)) {
              val cur = newMin.getOrNull(key)
              if (cur == null || e.event_id < cur.event_id) newMin.update(key, e)
            }
          }
          newMin.foreachKey(bloom.putLong)
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          state.update(bos.toByteArray)
          // deterministic emit order (the emitted set is tiny vs the batch)
          newMin.values.toArray.sortBy(_.event_id).iterator
      }
  }

  /** Two-tier EXACT streaming dedup (VERDICT r6 item 4): [[bloomDedup]]
    * trades a small false-drop rate (the Bloom fpp tail) for bounded
    * state; this variant keeps the bounded state AND zero false drops by
    * never dropping on a Bloom positive — it TAGS instead of filters.
    *
    * Tier 1 (this operator, streaming): probe-negative rows are
    * `definitely_new = true` — Bloom has no false negatives, so every such
    * row is a true first occurrence and can enter the corpus immediately
    * with no further check. Probe-positive rows are emitted with
    * `definitely_new = false`: CANDIDATE duplicates, a true-duplicate
    * stream plus the ~fpp sliver of false positives.
    *
    * Tier 2 (batch, downstream): only the candidate sliver — fpp·|new
    * keys| + |true dups| rows, not the corpus — goes through an exact
    * confirm join against the accumulated key store, exactly the
    * [[graft.queries.CorpusPrep]] `dedup_bloom_prefilter` confirm-join
    * shape. StreamingSpec pins the end-to-end exactness: tier-1 output
    * partitions losslessly (no row dropped), no duplicate is ever tagged
    * definitely-new, and confirm(candidates) ∪ definitely-new == the exact
    * batch-dedup survivor set on a corpus sized ABOVE one shard's
    * capacity.
    *
    * Intra-batch duplicates resolve exactly like [[bloomDedup]]: the
    * lowest-event-id row of a new key is the definitely-new survivor;
    * its intra-batch duplicates are emitted as candidates.
    */
  def bloomDedupTagged(
      events: Dataset[(Long, Event)],
      shards: Int = 32,
      capacityPerShard: Long = 1 << 20,
      fpp: Double = 0.01): Dataset[(Event, Boolean)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.util.sketch.BloomFilter
    events
      .groupByKey { case (key, _) => ((key % shards) + shards) % shards }
      .flatMapGroupsWithState[Array[Byte], (Event, Boolean)](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Event)], state: GroupState[Array[Byte]]) =>
          val bloom = state.getOption
            .map(b => BloomFilter.readFrom(b))
            .getOrElse(BloomFilter.create(capacityPerShard, fpp))
          val newMin = scala.collection.mutable.LongMap.empty[Event]
          val candidates = scala.collection.mutable.ArrayBuffer.empty[Event]
          rows.foreach { case (key, e) =>
            if (bloom.mightContainLong(key)) candidates += e
            else {
              val cur = newMin.getOrNull(key)
              if (cur == null) newMin.update(key, e)
              else if (e.event_id < cur.event_id) { candidates += cur; newMin.update(key, e) }
              else candidates += e
            }
          }
          newMin.foreachKey(bloom.putLong)
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          state.update(bos.toByteArray)
          (newMin.values.map((_, true)) ++ candidates.map((_, false)))
            .toArray.sortBy(_._1.event_id).iterator
      }
  }
}
