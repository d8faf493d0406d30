package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.DocEmbed
import SharedSpark._

/** Doc-keyed embedding featurizer + LSH screen (VERDICT r12 item 1). */
class DocEmbedSpec extends AnyFunSuite {
  import spark.implicits._

  private val Sf001 = "/root/testdata/sf0.01"

  private def plantedDir(): String = {
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "src0"),
      (2L, "the quick brown fox jumps over the lazy dog", "en", "src0"), // exact dup of 1
      (3L, "a completely different document about spark", "en", "src0"),
      (4L, "xy", "en", "src0"), // single token: no bigrams, no embedding
      (5L, "alpha beta", "en", "src0") // one bigram: unit vector
    ).map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    val dir = "target/tmp/docembed_corpus"
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("derived embeddings: unit-norm float32, NULL below the bigram domain") {
    val dir = plantedDir()
    val emb = DocEmbed.docEmbeddings(spark, dir).orderBy("doc_id").collect()
    assert(emb.length === 5)
    val byId = emb.map(r => r.getLong(0) -> r).toMap
    assert(byId(4L).isNullAt(1), "1-token doc must carry NULL embedding")
    // identical text ⇒ identical embedding, exactly (same integer vector)
    assert(byId(1L).getSeq[Float](1) === byId(2L).getSeq[Float](1))
    // unit norm within float rounding
    for (id <- Seq(1L, 2L, 3L, 5L)) {
      val v = byId(id).getSeq[Float](1)
      assert(v.length === DocEmbed.Dims)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"doc $id norm $n")
    }
    // the single-bigram doc is a ±1 one-hot
    assert(byId(5L).getSeq[Float](1).map(math.abs).sum === 1.0f)
  }

  test("docEmbeddings prefers a materialized doc_embeddings table and the DataGen emission equals the derivation") {
    val dir = plantedDir()
    val docs = Tables.documents(spark, dir)
    val derived = DocEmbed.deriveDocEmbeddings(docs)
    // materialize the linkage table the way DataGen does (single parquet file)
    val tmp = s"$dir/_emb_tmp"
    derived.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst.get
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$dir/doc_embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    try {
      val fromFile = DocEmbed.docEmbeddings(spark, dir)
      // file path taken: plan contains a scan of doc_embeddings.parquet
      assert(fromFile.queryExecution.sparkPlan.toString.contains("doc_embeddings"))
      val a = fromFile.orderBy("doc_id").collect().toSeq.map(_.toString)
      val b = derived.orderBy("doc_id").collect().toSeq.map(_.toString)
      assert(a === b, "materialized linkage table drifted from the derivation")
    } finally {
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/doc_embeddings.parquet"))
      // the staging dir must not linger in the shared planted corpus
      // (ADVICE r13) — later tests treat that dir as the whole fixture
      val tmpDir = java.nio.file.Paths.get(tmp)
      if (java.nio.file.Files.exists(tmpDir)) {
        val walk = java.nio.file.Files.walk(tmpDir)
        try
          walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.delete(p))
        finally walk.close()
      }
    }
  }

  test("screen: exact dup flagged at cosine exactly ~1, keep-lowest canonical; unrelated docs unflagged") {
    val dir = plantedDir()
    val out = DocEmbed.dedupEmbeddingDocLsh(spark, dir).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 2L) // dup_id
    assert(out(0).getLong(1) === 1L) // canonical_id
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-12)
  }

  test("persisted-index probe output is identical to the in-query screen") {
    val base = DocEmbed.dedupEmbeddingDocLsh(spark, Sf001).collect().toSeq.map(_.toString)
    val probe = DocEmbed.dedupEmbeddingDocProbe(spark, Sf001).collect().toSeq.map(_.toString)
    assert(probe === base)
    // second probe call hits the persisted index (dir exists, no rebuild)
    val again = DocEmbed.dedupEmbeddingDocProbe(spark, Sf001).collect().toSeq.map(_.toString)
    assert(again === base)
  }

  test("fixture screen is deterministic across runs and nonempty at sf0.01") {
    val a = DocEmbed.dedupEmbeddingDocLsh(spark, Sf001).collect().toSeq.map(_.toString)
    val b = DocEmbed.dedupEmbeddingDocLsh(spark, Sf001).collect().toSeq.map(_.toString)
    assert(a === b)
    assert(a.nonEmpty) // measured: 20 flagged docs at sf0.01
    // flagged ids are distinct (one canonical per dup by the rn=1 rule)
    val ids = DocEmbed.dedupEmbeddingDocLsh(spark, Sf001).select("dup_id").collect().map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
  }
}
