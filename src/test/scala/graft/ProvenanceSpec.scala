package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Provenance
import SharedSpark._

/** Edge-case pins for the URL canonicalizer plus a plain-Scala recompute
  * of the per-domain accounting — the canonicalization rules are asserted
  * on PLANTED urls (the fixture-synth toggles can't reach every branch:
  * e.g. non-default ports, `ref=`/`gclid=` params, fragment-only urls),
  * and the accounting query is re-derived independently of Spark SQL.
  */
class ProvenanceSpec extends AnyFunSuite {

  private def canonOf(urls: Seq[String]): Map[String, String] = {
    import spark.implicits._
    urls.toDF("u")
      .select(col("u"), Provenance.urlCanonical(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("urlCanonical: planted urls hit every rule") {
    val cases = Map(
      // scheme/host case + www + default https port + dup slash + trailing
      // slash + tracking params + unsorted params + fragment, all at once
      "HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&b=2&a=1#frag" ->
        "https://example.com/a/b?a=1&b=2",
      // http default port dropped; root path slash preserved
      "http://Site.Org:80/" -> "http://site.org/",
      // NON-default port survives
      "http://site.org:8080/x" -> "http://site.org:8080/x",
      // https on http's default port is NOT a default — kept
      "https://site.org:80/x" -> "https://site.org:80/x",
      // empty path becomes '/'
      "https://x.com" -> "https://x.com/",
      // all params tracking → query dropped entirely
      "https://x.com/?ref=abc&gclid=1&fbclid=2&utm_campaign=c" -> "https://x.com/",
      // empty params removed; duplicate NON-tracking params kept
      "https://x.com/p?a=1&&a=1" -> "https://x.com/p?a=1&a=1",
      // only ONE leading www. stripped (www.www → www survives)
      "https://WWW.www.X.com/p" -> "https://www.x.com/p",
      // 'ref=' is tracking but 'referer=' is not (prefix is exact)
      "https://x.com/p?referer=z&ref=y" -> "https://x.com/p?referer=z",
      // fragment-only tail; path collapse of 3+ slashes
      "https://x.com///a///b#c" -> "https://x.com/a/b",
      // params sort byte-wise
      "https://x.com/p?z=1&a=2&m=3" -> "https://x.com/p?a=2&m=3&z=1",
      // --- rule 5: percent-encoding normalization (r12) ---
      // unreserved escapes decode (%7E → ~, %41 → A, %2d → -); reserved
      // %2F is case-folded but NEVER decoded (no new path delimiter)
      "https://x.com/%7Euser/p%41th%2dx?n=%2f" -> "https://x.com/~user/pAth-x?n=%2F",
      // decoding cannot create a slash run or a trailing slash: %2F stays
      // an escape, so the path structure is untouched
      "https://x.com/a%2fb%2F/" -> "https://x.com/a%2Fb%2F",
      // invalid escapes pass through byte-identical: bare trailing %, %
      // followed by <2 hex digits, % followed by non-hex
      "https://x.com/100%" -> "https://x.com/100%",
      "https://x.com/%zz/x%3znope" -> "https://x.com/%zz/x%3znope",
      // an escaped tracking key decodes BEFORE the filter → still dropped
      "https://x.com/p?%75tm_source=x&a=1" -> "https://x.com/p?a=1",
      // escaped digits in a param value decode back (oracle toggle b=%32)
      "https://x.com/p?b=%32" -> "https://x.com/p?b=2",
      // rule 3 (ADVICE r11): a bare trailing colon with no port digits is
      // stripped like a default port
      "https://x.com:/p" -> "https://x.com/p",
      // scheme-less input: the documented degenerate normal form (object
      // scaladoc) — empty scheme/host, root path; NOT silently parsed
      "example.com/x?a=1" -> ":///?a=1")
    val got = canonOf(cases.keys.toSeq)
    cases.foreach { case (raw, want) =>
      assert(got(raw) === want, s"for $raw")
    }
  }

  test("urlCanonical is idempotent on the fixture corpus (canon(canon(u)) = canon(u))") {
    val rows = Tables.documents(spark, Sf0001)
      .select(Provenance.urlCanonical(Provenance.urlRaw).as("c1"))
      .select(col("c1"), Provenance.urlCanonical(col("c1")).as("c2"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("url_canonicalize: canonical form depends only on (source, lang, doc_id%7)") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"), col("lang")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(0) % 7))).toMap
    val got = Provenance.urlCanonicalize(spark, Sf0001)
      .select(col("doc_id"), col("url_canon"), col("domain")).collect()
    assert(got.length === docs.size)
    val byTriple = got.groupBy(r => docs(r.getLong(0)))
    byTriple.foreach { case ((src, lang, k), rows) =>
      // every doc with the same triple collapses to the same canonical url
      assert(rows.map(_.getString(1)).distinct.length === 1)
      assert(rows.head.getString(1) ===
        s"https://$src.example.com/$lang/p$k?a=1&b=2&id=$k" +
          (if (k % 2 == 0) "&p=x%2Fy" else ""))
      assert(rows.head.getString(2) === s"$src.example.com")
    }
  }

  test("urlCanonical: randomized URLs — idempotent, normal form, toggle-invariant (seeded)") {
    val rnd = new scala.util.Random(4242)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    // a base URL and a random "recrawl variant" that differs only in the
    // aspects canonicalization removes — the pair must collapse
    def basePair(): (String, String) = {
      val host = pick(Seq("alpha.com", "beta.org", "c.d.example.net"))
      val segs = (1 to rnd.nextInt(3)).map(_ => pick(Seq("a", "b2", "x-y")))
      val params = rnd.shuffle(Seq("k=1", "q=z", "id=9").take(rnd.nextInt(4)))
      def variant(): String = {
        val scheme = pick(Seq("https", "HTTPS", "htTps"))
        val www = pick(Seq("", "www.", "WWW."))
        val hostCase = if (rnd.nextBoolean()) host.toUpperCase else host
        val port = pick(Seq("", ":443"))
        val path =
          if (segs.isEmpty) pick(Seq("", "/"))
          else segs.map(s => "/".*(1 + rnd.nextInt(2)) + s).mkString +
            pick(Seq("", "/"))
        val track = pick(Seq(Seq.empty, Seq("utm_x=1"), Seq("fbclid=z", ""), Seq("ref=r")))
        val qs = rnd.shuffle(params ++ track)
        val q = if (qs.isEmpty) "" else "?" + qs.mkString("&")
        val frag = pick(Seq("", "#f", "#sec/2?x=1"))
        s"$scheme://$www$hostCase$port$path$q$frag"
      }
      (variant(), variant())
    }
    val pairs = (1 to 200).map(_ => basePair())
    val urls = pairs.flatMap(p => Seq(p._1, p._2))
    val canon = canonOf(urls)
    // toggle-invariance: both members of a pair collapse to one canonical
    pairs.foreach { case (u1, u2) =>
      assert(canon(u1) === canon(u2), s"variants diverged: $u1 vs $u2")
    }
    // normal form + idempotence
    val normal = ("^(https?)://[a-z0-9.-]+(:[0-9]+)?(/[^?#]*)?(\\?[^#]*)?$").r
    val again = canonOf(canon.values.toSeq.distinct)
    canon.values.foreach { c =>
      assert(normal.findFirstIn(c).isDefined, s"not normal: $c")
      assert(!c.drop("https://".length).contains("//"), s"slash run survives: $c")
      assert(!c.contains("#"), s"fragment survives: $c")
      assert(!c.contains("utm_") && !c.contains("fbclid="), s"tracking survives: $c")
      val q = c.dropWhile(_ != '?').drop(1)
      if (q.nonEmpty) assert(q.split("&").toSeq === q.split("&").toSeq.sorted)
      assert(again(c) === c, s"not idempotent: $c -> ${again(c)}")
    }
  }

  test("domain_dedup_accounting: plain-Scala recompute from the synthesis rule") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // independent recompute: raw-variant key = every toggle the synthesis
    // varies; canonical key = (source, lang, k). Raw string equality is
    // what the query counts, so rebuild the raw url verbatim.
    def rawUrl(id: Long, src: String, lang: String): String = {
      val k = id % 7
      (if (id % 2 == 0) "HTTPS" else "https") + "://" +
        (if (id % 3 == 0) "WWW." else "") +
        (if (id % 2 == 0) src.toUpperCase else src) + ".Example.COM" +
        (if (id % 5 == 0) ":443" else "") +
        s"/$lang" + (if (id % 4 == 0) "//" else "/") + s"p$k" +
        (if (id % 2 == 1) "/" else "") +
        (if (id % 2 == 0) s"?a=1&utm_source=feed&b=2&id=$k"
         else s"?b=%32&id=$k&fbclid=$id&a=1") +
        (if (k % 2 == 0) { if (id % 2 == 0) "&p=x%2Fy" else "&p=x%2fy" } else "") +
        (if (id % 5 == 0) s"#sec$id" else "")
    }
    val want = docs.groupBy(_._2).map { case (src, members) =>
      val nDocs = members.length.toLong
      val nRaw = members.map { case (id, s, l) => rawUrl(id, s, l) }.distinct.length.toLong
      val nCanon = members.map { case (id, _, l) => (l, id % 7) }.distinct.length.toLong
      (s"$src.example.com", (nDocs, nRaw, nCanon))
    }
    val got = Provenance.domainDedupAccounting(spark, Sf0001).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val (nDocs, nRaw, nCanon) = want(r.getString(0))
      assert(r.getLong(1) === nDocs, s"n_docs for ${r.getString(0)}")
      assert(r.getLong(2) === nRaw, s"n_raw_variants for ${r.getString(0)}")
      assert(r.getLong(3) === nCanon, s"n_canonical for ${r.getString(0)}")
      assert(r.getLong(4) === nDocs - nCanon)
      assert(r.getDouble(5) === (nDocs - nCanon).toDouble / nDocs)
    }
    // the synthesis actually produces duplicate mass (the accounting isn't
    // vacuously all-zeros) — at 500 docs over 20 sources × 5 langs × 7 k's
    // collisions are guaranteed by pigeonhole
    assert(got.map(_.getLong(4)).sum > 0)
  }
}
