package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SharedSpark._
import graft.queries.Refinery

/** Oracle-independent recomputes of the corpus-refinement family: every
  * operator's output is recomputed in plain Scala from the collected
  * documents with the same definitions (8-token lines, winnowing window
  * minima, token-frequency-weighted pair counts, the named rules, 2^40
  * fixed-point band means) — so a green DuckDB hash can never be two
  * engines sharing one bug in the SQL.
  */
class RefinerySpec extends AnyFunSuite {

  private val Fx = 1099511627776.0

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Raw tokenizer (split on single space, empties KEPT) — the shingle/
    * line family's convention, mirroring TextOps.tokensCol. */
  private def rawDocs: Seq[(Long, String, Seq[String])] =
    Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1).toSeq))
      .toSeq

  test("line_dedup_rebuild: lines, df>=2 drop set, and rebuilt md5 recompute exactly") {
    val docs = rawDocs
    def linesOf(t: Seq[String]): Seq[(Long, String)] =
      t.grouped(8).zipWithIndex.map { case (g, i) => ((i + 1).toLong, g.mkString(" ")) }.toSeq
    val allLines = docs.flatMap { case (id, _, t) => linesOf(t).map { case (li, lt) => (id, li, lt) } }
    val boiler = allLines.groupBy(_._3).collect {
      case (lt, rows) if rows.map(_._1).distinct.size >= 2 => lt
    }.toSet
    val expected = docs.map { case (id, _, t) =>
      val ls = linesOf(t)
      val kept = ls.filterNot(l => boiler(l._2))
      val rebuilt = kept.sortBy(_._1).map(_._2).mkString(" ")
      (id, ls.size.toLong, kept.size.toLong, rebuilt.length.toLong, md5hex(rebuilt))
    }.sortBy(_._1)
    val got = Refinery.lineDedupRebuild(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(got === expected)
    // the corpus's planted duplicates make the operator non-vacuous
    assert(expected.exists(e => e._3 < e._2), "no line was ever dropped — threshold no longer discriminates")
  }

  test("winnow_fingerprints: window minima, distinct selection, and density recompute exactly") {
    val docs = rawDocs
    val expected = docs
      .filter(_._3.size >= 6)
      .map { case (id, _, t) =>
        val hs = t.sliding(3).map(g => md5hex(g.mkString(" "))).toSeq
        val sel = hs.sliding(4).map(_.min).toSeq.distinct
        (id, hs.size.toLong, sel.size.toLong, sel.min,
          sel.size.toDouble / (hs.size - 3).toDouble)
      }
      .sortBy(_._1)
    val got = Refinery.winnowFingerprints(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
    assert(got === expected)
    // winnowing guarantee: at least one fingerprint per window ⇒ density
    // within (0, 1]; and the selected set is never larger than the windows
    got.foreach { case (_, nk, ns, _, d) =>
      assert(ns >= 1 && ns <= nk - 3)
      assert(d > 0.0 && d <= 1.0)
    }
  }

  test("winnowing guarantee: docs sharing a >=6-token run share a fingerprint") {
    // construct the property from the data itself: the generator's planted
    // near-duplicate pairs share long runs; verify via doc-pair spot check
    val docs = rawDocs.map { case (id, _, t) => id -> t }.toMap
    // find any two docs sharing a 6-token run (bounded scan of small sf)
    val runIndex = scala.collection.mutable.Map[String, Long]()
    var found: Option[(Long, Long)] = None
    for ((id, t) <- docs.toSeq.sortBy(_._1) if found.isEmpty; w <- t.sliding(6).map(_.mkString(" "))) {
      runIndex.get(w) match {
        case Some(other) if other != id => found = Some((other, id))
        case _ => runIndex(w) = id
      }
    }
    found.foreach { case (a, b) =>
      def selOf(t: Seq[String]): Set[String] = {
        val hs = t.sliding(3).map(g => md5hex(g.mkString(" "))).toSeq
        hs.sliding(4).map(_.min).toSet
      }
      assert(selOf(docs(a)).intersect(selOf(docs(b))).nonEmpty,
        s"docs $a/$b share a 6-token run but no winnow fingerprint")
    }
    assert(found.nonEmpty, "corpus has no shared 6-token run — property untestable")
  }

  test("bpe_merge_pairs: top-30 adjacent-pair counts recompute from token frequencies") {
    val wf = rawDocs.flatMap(_._3).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, n) <- wf if w.length >= 2; i <- 0 until w.length - 1)
      counts(w.substring(i, i + 2)) += n
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(30)
    val got = Refinery.bpeMergePairs(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  /** Plain-Scala rank sweep with the committed merge table prefix — the
    * reference semantics for bpe_encode / BpeApply: per rank, one
    * left-to-right greedy non-overlapping merge pass; code points, not
    * UTF-16 units. */
  private def bpeSweep(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n); i += n
      }
      out.toSeq
    }
    for ((a, b) <- merges) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  test("bpe_encode: weighted symbol counts recompute from a plain-Scala rank sweep; symbols reassemble words") {
    val wf = rawDocs.flatMap(_._3).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, n) <- wf; s <- bpeSweep(w, Refinery.BpeMerges)) counts(s) += n
    val expected = counts.toSeq.sortBy { case (s, n) => (-n, s) }.take(100)
    val got = Refinery.bpeEncode(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
    // losslessness: encoding never alters content, only segmentation
    for ((w, _) <- wf)
      assert(bpeSweep(w, Refinery.BpeMerges).mkString === w, s"word $w")
  }

  test("BpeApply expression == chained mergePairFold plan at collapsible k; code points; cascaded merges") {
    import spark.implicits._
    // ararat/aaaa: overlap greed; paparazzi: the (p, ar) cascade after
    // (a, r); straße/naïve: multi-byte; the clef is an astral (surrogate
    // pair) code point — UTF-16-unit splitting would shear it
    val words = Seq("error", "minor", "paparazzi", "canal", "stationary",
      "ararat", "aaaa", "x", "straße", "naïve", "par", "a𝄞b").toDF("w")
    val k = 4 // the composed plan is ~4^k nodes — keep it collapsible here
    val seg0 = words.withColumn("s",
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
    val viaFold = Refinery.BpeMerges.take(k).foldLeft(seg0) { case (df, (a, b)) =>
      df.withColumn("s", Refinery.mergePairFold(col("s"), a, b))
    }.select(col("w"), col("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaExpr = words
      .select(col("w"),
        graft.functions.BpeApply.bpe_apply(col("w"), Refinery.BpeMerges.take(k)).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaScala = viaExpr.keys.map(w => w -> bpeSweep(w, Refinery.BpeMerges.take(k))).toMap
    assert(viaExpr === viaFold)
    assert(viaExpr === viaScala)
    // full-table spot check against plain Scala (the fold plan can't run k=12)
    val full = words.select(col("w"),
      graft.functions.BpeApply.bpe_apply(col("w"), Refinery.BpeMerges).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(full === full.keys.map(w => w -> bpeSweep(w, Refinery.BpeMerges)).toMap)
  }

  test("bpeLearnMerges re-derives the committed table; hand-computed trace on a planted corpus") {
    import spark.implicits._
    assert(Refinery.bpeLearnMerges(Tables.documents(spark, Sf0001), 12) ===
      Refinery.BpeMerges)
    // planted: "abab" ×2 + "ab" ×1 → pair counts (a,b)=5, (b,a)=2 →
    // rank 1 merges (a,b); re-segmented [ab,ab]/[ab] → rank 2 (ab,ab)
    val docs = Seq((1L, "abab ab abab")).toDF("doc_id", "text")
    assert(Refinery.bpeLearnMerges(docs, 2) === Seq(("a", "b"), ("ab", "ab")))
  }

  test("gopher_quality_rules: every named rule recomputes; no rule is vacuous") {
    val stop = Set("the", "and", "of", "to", "in", "is", "a", "an")
    val expected = rawDocs.map { case (id, src, raw) =>
      val t = raw.filter(_.nonEmpty)
      val meanLen = t.map(_.length).sum.toDouble / t.size
      val nStop = t.filter(stop).distinct.size
      val topShare = t.groupBy(identity).map(_._2.size).max.toDouble / t.size
      val rLen = t.size >= 25
      val rMean = meanLen >= 4.0 && meanLen <= 10.0
      val rStop = nStop >= 2
      val rRep = topShare <= 0.125
      (id, src, rLen, rMean, rStop, rRep, rLen && rMean && rStop && rRep)
    }.sortBy(_._1)
    val got = Refinery.gopherQualityRules(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(got === expected)
    // each rule must discriminate on this corpus (both values occur)
    Seq(2, 3, 4, 5).foreach { i =>
      val vals = got.map(_.productElement(i).asInstanceOf[Boolean]).toSet
      assert(vals === Set(true, false), s"rule at column $i is vacuous")
    }
  }

  test("quality_calibration: bands recompute from per-doc scores; volumes cover the corpus") {
    val stop = Set("the", "and", "of", "to", "in", "is", "a", "an")
    val scored = rawDocs.map { case (_, _, raw) =>
      val t = raw.filter(_.nonEmpty)
      val nTok = t.size.toDouble
      val stopRatio = t.count(stop).toDouble / t.size
      val meanLen = t.map(_.length).sum.toDouble / t.size
      val distinctRatio = t.distinct.size.toDouble / t.size
      val z = -1.0 + math.min(nTok / 100.0, 1.0) * 2.0 + stopRatio * 1.5 +
        (meanLen / 10.0) * 0.8 + distinctRatio * 1.2
      (z / (1.0 + math.abs(z)), nTok.toLong)
    }
    val expected = scored.groupBy { case (s, _) => math.floor(s * 20.0).toLong }
      .map { case (band, rows) =>
        val n = rows.size.toLong
        val sumFx = rows.map(r => math.floor(r._1 * Fx).toLong).sum
        val sumTok = rows.map(_._2).sum
        val nPass = rows.count(_._1 >= 0.2).toLong
        (band, band / 20.0, n, sumFx.toDouble / (n.toDouble * Fx),
          sumTok.toDouble / n.toDouble, nPass)
      }.toSeq.sortBy(_._1)
    val got = Refinery.qualityCalibration(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(got === expected)
    assert(got.map(_._3).sum === rawDocs.size.toLong)
  }
}
