package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import SharedSpark._

class MultimodalSpec extends AnyFunSuite {

  test("synthetic media carries a real binary column; image rows are real PNG containers") {
    val m = Multimodal.syntheticMedia(spark, Sf0001)
    assert(m.schema("content").dataType.typeName === "binary")
    assert(m.count() === 500)
    // PNG magic: every image payload starts \x89PNG\r\n\x1a\n
    val badMagic = m.where(col("media_type") === "image")
      .where(hex(expr("substring(content, 1, 8)")) =!= "89504E470D0A1A0A")
      .count()
    assert(badMagic === 0)
  }

  test("decoded PNG header dimensions equal the generation formula, audio rows have no dims") {
    val meta = Multimodal.extractMeta(spark, Multimodal.syntheticMedia(spark, Sf0001))
    assert(meta.count() === 500)
    val dims = Tables.documents(spark, Sf0001)
      .select(col("doc_id"),
        (col("n_chars") % 2 === 0).as("is_image"),
        (col("n_chars") % 64 + 1).cast("int").as("w"),
        (col("n_chars") % 48 + 1).cast("int").as("h"))
    val joined = meta.join(dims, "doc_id")
    assert(joined.where(col("is_image") &&
      (col("width") =!= col("w") || col("height") =!= col("h"))).count() === 0)
    assert(joined.where(!col("is_image") &&
      (col("width").isNotNull || col("height").isNotNull)).count() === 0)
    assert(joined.where(col("is_image")).count() > 0)
  }

  test("encode/decode round-trip is lossless on a known image") {
    val bytes = Multimodal.makePng(37, 21, seed = 42L)
    assert(Multimodal.decodePng(bytes) === ((37, 21)))
    // deterministic encode: same inputs, same container bytes
    assert(java.util.Arrays.equals(bytes, Multimodal.makePng(37, 21, seed = 42L)))
  }

  test("WAV encode/decode round-trip is lossless; container is canonical 44-byte-header PCM") {
    val bytes = Multimodal.makeWav(16000, 2, 1000, seed = 42L)
    assert(Multimodal.decodeWav(bytes) === ((16000, 2, 1000L)))
    // canonical PCM WAVE: 44 header bytes + 2·channels·nSamples data bytes.
    // The multimodal_frame_sample ORACLE depends on this size formula —
    // if the writer ever emits extra chunks this pin fails before the
    // driver compare does.
    assert(bytes.length === 44 + 2 * 2 * 1000)
    // RIFF/WAVE magic
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    // deterministic encode
    assert(java.util.Arrays.equals(bytes, Multimodal.makeWav(16000, 2, 1000, seed = 42L)))
  }

  test("decoded WAV params equal the generation formula; media-type pre-filter matches post-map tags") {
    val meta = Multimodal.extractMeta(spark, Multimodal.syntheticMedia(spark, Sf0001, Some("audio")))
    assert(meta.where(col("media_type") =!= "audio").count() === 0)
    val expected = Tables.documents(spark, Sf0001)
      .where(col("n_chars") % 2 === 1)
      .select(col("doc_id"),
        (lit(8000) * (col("n_chars") % 3 + 1)).cast("int").as("xr"),
        ((col("n_chars") / 2).cast("long") % 2 + 1).cast("int").as("xc"),
        ((col("n_chars") % 100) * 40 + 40).cast("long").as("xn"))
    assert(meta.count() === expected.count())
    val bad = meta.join(expected, "doc_id").where(
      col("sample_rate") =!= col("xr") || col("channels") =!= col("xc") ||
        col("n_samples") =!= col("xn") ||
        col("byte_len") =!= lit(44) + lit(2) * col("xc") * col("xn"))
    assert(bad.count() === 0)
  }

  test("decode runs distributed: plan has no driver-side collect") {
    // inspect the pre-checkpoint pipeline: the registered multimodal_meta
    // localCheckpoints the skinny metadata before its ORDER BY (so the
    // sort's range sampling can't re-run the codec), which truncates the
    // visible lineage — the decode stage itself lives in extractMeta
    val meta = Multimodal.extractMeta(spark, Multimodal.syntheticMedia(spark, Sf0001))
    // mapPartitions shows up as a (De)SerializeFromObject + MapPartitions plan
    val plan = meta.queryExecution.executedPlan.toString()
    assert(plan.contains("MapPartitions"), plan.take(500))
    // localCheckpoint keeps partitions on executors — nothing in the
    // registered query collects to the driver (the checkpointed scan shows
    // as an RDD scan, not a LocalTableScan of collected rows)
    val registered = Multimodal.multimodalMeta(spark, Sf0001).queryExecution.executedPlan.toString()
    assert(!registered.contains("LocalTableScan"), registered.take(500))
  }

  test("checksum and byte_len describe the actual payload bytes") {
    val meta = Multimodal.extractMeta(spark, Multimodal.syntheticMedia(spark, Sf0001))
    // audio rows: canonical WAV container size is recomputable from the
    // generation formula (44-byte header pin above)
    val expected = Tables
      .documents(spark, Sf0001)
      .where(col("n_chars") % 2 === 1)
      .select(col("doc_id"),
        (lit(44) + lit(2) * ((col("n_chars") / 2).cast("long") % 2 + 1) *
          ((col("n_chars") % 100) * 40 + 40)).cast("long").as("len"))
    val audioBad = meta.where(col("media_type") === "audio").join(expected, "doc_id")
      .where(col("byte_len") =!= col("len") || length(col("checksum_md5")) =!= 32)
    assert(audioBad.count() === 0)
    // image rows: PNG stream is non-empty and checksum is well-formed hex
    val imageBad = meta.where(col("media_type") === "image")
      .where(col("byte_len") <= 8 || length(col("checksum_md5")) =!= 32)
    assert(imageBad.count() === 0)
  }

  test("header-only PNG parse (reused reader) equals the full-decode dimensions") {
    // the metadata hot path reads only the IHDR; pin it to the pixel-
    // inflating reference decode on a spread of generated sizes
    val reader = Multimodal.newPngReader()
    try {
      Seq(0L, 2L, 46L, 62L, 94L, 126L, 1000L, 4094L).foreach { n =>
        val (w, h) = Multimodal.imageDims(n)
        val png = Multimodal.makePng(w, h, n)
        assert(Multimodal.decodePngHeader(reader, png) === Multimodal.decodePng(png))
      }
    } finally reader.dispose()
  }

  test("reused-writer PNG encode is byte-identical to the ImageIO.write reference") {
    val writer = Multimodal.newPngWriter()
    try {
      Seq(0L, 2L, 46L, 62L, 94L, 126L, 1000L, 4094L).foreach { n =>
        val (w, h) = Multimodal.imageDims(n)
        assert(java.util.Arrays.equals(
          Multimodal.makePngWith(writer, w, h, n), Multimodal.makePng(w, h, n)))
      }
    } finally writer.dispose()
  }

  test("SPI-resolved WAV writer/reader are byte- and field-identical to the AudioSystem forms") {
    val w = Multimodal.newWavWriter()
    val r = Multimodal.newWavReader()
    Seq(1L, 3L, 47L, 63L, 95L, 127L, 1001L, 4095L).foreach { n =>
      val (rate, ch, s0) = Multimodal.audioParams(n)
      val viaSpi = Multimodal.makeWavWith(w, rate, ch, s0, n)
      val viaSystem = Multimodal.makeWav(rate, ch, s0, n)
      assert(java.util.Arrays.equals(viaSpi, viaSystem))
      assert(Multimodal.decodeWavWith(r, viaSpi) === Multimodal.decodeWav(viaSystem))
    }
  }
}
