package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (north star): image/audio/video payloads as
  * opaque `binary` columns plus typed metadata, processed partition-wise in
  * fixed-size batches — the Scala analog of an Arrow-batched decode UDF.
  *
  * The actual media decode is a STUB (no image/audio libraries exist in
  * this container): [[decodeStub]] derives deterministic fake dimensions
  * from the bytes. Everything around it — schema, binary encoding,
  * partition-wise batch iteration, metadata struct shape — is the real
  * Spark plumbing a production decode would use, and is what the tests
  * cover. Swapping [[decodeStub]] for a real codec changes no plan shape.
  */
object Multimodal {

  case class MediaRow(
      doc_id: Long,
      media_type: String,
      content: Array[Byte],
      byte_len: Long,
      checksum_md5: String)
  case class MediaMeta(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      checksum_md5: String)

  /** Batch size for partition-wise decode (Arrow-batch-shaped). */
  val DecodeBatchSize = 64

  /** STUB decode ??? — deterministic fake in lieu of a real codec:
    * "width/height" are derived from the payload length. A real
    * implementation would parse the container header here.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) =
    (1 + (bytes.length % 640), 1 + (bytes.length % 480))

  /** Synthesize a media table from documents: payload = UTF-8 bytes of the
    * text, media_type derived deterministically from n_chars parity.
    */
  def syntheticMedia(spark: SparkSession, sf: String): DataFrame =
    Tables
      .documents(spark, sf)
      .select(
        col("doc_id"),
        when(col("n_chars") % 2 === 0, "image").otherwise("audio").as("media_type"),
        col("text").cast("binary").as("content"))

  /** Partition-wise, batched metadata extraction over the binary column.
    * Runs on executors; no data moves to the driver; batches bound peak
    * memory per task exactly like an Arrow-batched UDF would.
    *
    * Division of labor: everything a built-in can compute stays in Catalyst
    * (md5 / octet_length are codegen'd expressions in the projection below —
    * never re-implemented inside the lambda); the mapPartitions step exists
    * ONLY for the codec call a built-in cannot express. Plan shape is
    * scan → project(built-ins) → DeserializeToObject → MapPartitions: one
    * pipeline, no shuffle.
    */
  def extractMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .withColumn("byte_len", octet_length(col("content")).cast("long"))
      .withColumn("checksum_md5", md5(col("content")))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h) = decodeStub(r.content)
            MediaMeta(r.doc_id, r.media_type, r.byte_len, w, h, r.checksum_md5)
          }
        }
      }
      .toDF()
  }

  /** Oracle-checkable registration: synthetic media → batched decode →
    * metadata, ordered. The oracle replays the stub arithmetic over
    * octet_length and md5 in SQL — same math, engine-neutral.
    */
  def multimodalMeta(spark: SparkSession, sf: String): DataFrame =
    extractMeta(spark, syntheticMedia(spark, sf)).orderBy(col("doc_id"))

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CASE WHEN n_chars % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  CAST(1 + octet_length(encode(text)) % 640 AS INT) AS width,
      |  CAST(1 + octet_length(encode(text)) % 480 AS INT) AS height,
      |  md5(text) AS checksum_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize planning (image path): target box 256×256, aspect preserved.
    * All-integer arithmetic ((dim·256) div max(w,h)) so both engines agree
    * exactly — a real resize kernel would consume (out_w, out_h) per batch
    * in [[extractMeta]]'s mapPartitions slot; the PLANNING of sizes is pure
    * relational projection and stays in codegen.
    */
  def multimodalResize(spark: SparkSession, sf: String): DataFrame =
    extractMeta(spark, syntheticMedia(spark, sf))
      .where(col("media_type") === "image")
      .select(
        col("doc_id"),
        col("width"),
        col("height"),
        expr("CAST(width AS BIGINT) * 256 div greatest(width, height)").as("out_w"),
        expr("CAST(height AS BIGINT) * 256 div greatest(width, height)").as("out_h"))
      .orderBy(col("doc_id"))

  val multimodalResizeSql: String =
    """SELECT doc_id, width, height,
      |  CAST(width AS BIGINT) * 256 // greatest(width, height) AS out_w,
      |  CAST(height AS BIGINT) * 256 // greatest(width, height) AS out_h
      |FROM (
      |  SELECT doc_id,
      |    CAST(1 + octet_length(encode(text)) % 640 AS INT) AS width,
      |    CAST(1 + octet_length(encode(text)) % 480 AS INT) AS height
      |  FROM documents WHERE n_chars % 2 = 0
      |) ORDER BY doc_id""".stripMargin

  /** Frame sampling (video path): duration derived deterministically from
    * the payload (stub for container-header parsing), 4 fps, every 8th
    * frame. The sample positions are a per-row Generate — zero shuffles,
    * exactly the shape a real frame extractor feeds batch-wise.
    */
  def multimodalFrameSample(spark: SparkSession, sf: String): DataFrame =
    syntheticMedia(spark, sf)
      .where(col("media_type") === "audio") // stands in for the time-indexed modality
      .withColumn("duration_s", (octet_length(col("content")) % 60 + 1).cast("long"))
      .select(
        col("doc_id"),
        col("duration_s"),
        explode(expr("sequence(0, duration_s * 4 - 1, 8)")).as("frame_no"))
      .withColumn("t_offset_s", col("frame_no").cast("double") / 4.0)
      .orderBy(col("doc_id"), col("frame_no"))

  val multimodalFrameSampleSql: String =
    """SELECT doc_id, duration_s, unnest(range(0, duration_s * 4, 8)) AS frame_no,
      |  CAST(unnest(range(0, duration_s * 4, 8)) AS DOUBLE) / 4.0 AS t_offset_s
      |FROM (
      |  SELECT doc_id, CAST(octet_length(encode(text)) % 60 + 1 AS BIGINT) AS duration_s
      |  FROM documents WHERE n_chars % 2 = 1
      |) ORDER BY doc_id, frame_no""".stripMargin

  val registry: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("multimodal_meta", multimodalMeta _, multimodalMetaSql),
    ("multimodal_resize", multimodalResize _, multimodalResizeSql),
    ("multimodal_frame_sample", multimodalFrameSample _, multimodalFrameSampleSql)
  )
}
