package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with decode / feature-extraction
  * stubbed (no media libs in this container) behind a deterministic fake.
  *
  * The Spark-side plumbing is real: binary schema, per-partition batch
  * iteration (`mapPartitions` over a typed Dataset — the Scala analogue of
  * Python's `mapInPandas` batch shape), and codegen'd binary expressions for
  * the metadata path. Payloads here are the utf-8 bytes of `documents.text`
  * (the only deterministic bytes in the testdata), so the oracle can verify
  * the binary expression path end-to-end.
  *
  * Scale: all per-row map work, no shuffle; a real decoder would swap into
  * [[decodeStub]] without touching the plan shape. Partition sizing, not
  * operator design, is the 100 TB knob here.
  */
object Multimodal {

  /** One media record: opaque payload + metadata, as a training pipeline
    * would model an image/audio blob column. */
  final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  /** Deterministic fake "decode": width/height/frames derived from payload
    * bytes. A real image decoder would replace exactly this function. */
  def decodeStub(r: MediaRecord): (Long, Int, Int, Int) = {
    val n = r.content.length
    val w = 16 + (if (n > 0) (r.content(0) & 0x7f) else 0)
    val h = 16 + (if (n > 1) (r.content(1) & 0x7f) else 0)
    (r.doc_id, w, h, n / 16 + 1)
  }

  /** documents -> binary media records (utf-8 payload). */
  def mediaFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** Typed per-partition decode — the batch-shaped stub pipeline. */
  def decodeAll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaFrame(s, d)
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
      .toDF("doc_id", "width", "height", "n_frames")
  }

  /** Metadata extraction on the binary column (codegen'd expressions only;
    * oracle-checked): byte length, first-8-bytes hex header, frame count. */
  private def meta(s: SparkSession, d: String): DataFrame =
    mediaFrame(s, d)
      .select(
        col("doc_id"),
        col("media_type"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        // slice the binary *before* hex so only 8 bytes are stringified
        lower(hex(substring(col("content"), 1, 8))).as("header_hex"),
        (octet_length(col("content")).cast("long") + 15).divide(16).cast("long").as("n_chunks"))
      .orderBy("doc_id")

  private val metaOracle =
    """SELECT doc_id, 'text/plain' AS media_type,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      lower(substr(hex(encode(text)), 1, 16)) AS header_hex,
      CAST((octet_length(encode(text)) + 15) // 16 AS BIGINT) AS n_chunks
      FROM documents ORDER BY doc_id"""

  def all: Seq[Q] = Seq(
    Q("mm01_meta", meta, Some(metaOracle))
  )
}
