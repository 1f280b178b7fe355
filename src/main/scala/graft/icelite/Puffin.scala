package graft.icelite

import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** A blob to write into (or read from) a Puffin file: the payload bytes
  * plus the metadata the footer records about it. `blobType` follows the
  * spec's registered names — `apache-datasketches-theta-v1` is the one
  * Iceberg ANALYZE writes (one compact theta sketch per tracked column,
  * `fields` naming the source field id, `properties("ndv")` the rounded
  * estimate at write time). */
final case class PuffinBlob(
    blobType: String, fields: Seq[Int], snapshotId: Long, sequenceNumber: Long,
    bytes: Array[Byte], properties: Map[String, String] = Map.empty)

/** One footer entry as read back: blob metadata + absolute offset/length
  * into the file. */
final case class PuffinBlobMeta(
    blobType: String, fields: Seq[Int], snapshotId: Long, sequenceNumber: Long,
    offset: Long, length: Long, properties: Map[String, String])

/** Writer/reader for the Puffin file format (the Iceberg project's
  * statistics-file container, "Puffin file format" spec): a file is
  *
  * {{{ Magic | Blob1 .. BlobN | Magic FooterPayload FooterPayloadSize Flags Magic }}}
  *
  * with `Magic = 0x50 0x46 0x41 0x31` ("PFA1"), `FooterPayloadSize` a
  * 4-byte little-endian int, and `FooterPayload` the uncompressed JSON
  * FileMetadata (`flags` all-zero = no compression — the spec's default).
  * Blob payloads are opaque byte ranges addressed by absolute offset, so
  * a reader fetches the footer and then EXACTLY the blobs it wants — at
  * 100 TB the stats file is read footer-first, never streamed whole.
  *
  * Written from the public spec; conformant third-party readers (the
  * reference stack's PyIceberg/DuckDB, when they gain stats support) can
  * parse these files byte-for-byte. */
object Puffin {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31)

  /** Write `blobs` to a new Puffin file at `path`.
    * @return (file size in bytes, footer size in bytes) — the two numbers
    *         the table metadata's `statistics` entry records. */
  def write(fs: FileSystem, path: Path, blobs: Seq[PuffinBlob],
      fileProperties: Map[String, String] = Map.empty): (Long, Long) = {
    val out = fs.create(path, true)
    try {
      out.write(Magic)
      var offset = 4L
      val metas = blobs.map { b =>
        val m = PuffinBlobMeta(b.blobType, b.fields, b.snapshotId, b.sequenceNumber,
          offset, b.bytes.length.toLong, b.properties)
        out.write(b.bytes)
        offset += b.bytes.length
        m
      }
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      def props(p: Map[String, String]): String =
        p.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
      val payload = (metas.map { m =>
        s"""{"type":"${esc(m.blobType)}","fields":[${m.fields.mkString(",")}],""" +
          s""""snapshot-id":${m.snapshotId},"sequence-number":${m.sequenceNumber},""" +
          s""""offset":${m.offset},"length":${m.length},"properties":${props(m.properties)}}"""
      }.mkString("""{"blobs":[""", ",", "],") +
        s""""properties":${props(fileProperties)}}""").getBytes("UTF-8")
      out.write(Magic)
      out.write(payload)
      val tail = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array()
      out.write(tail)
      out.write(Array[Byte](0, 0, 0, 0)) // flags: uncompressed footer
      out.write(Magic)
      val fileSize = offset + 4 + payload.length + 4 + 4 + 4
      (fileSize, /* footer = Magic..Magic trailer */ 4L + payload.length + 12)
    } finally out.close()
  }

  /** Read the footer of the Puffin file at `path`: (file properties, blob
    * metadata in file order). Validates all four structural invariants
    * (both magics of the footer, the leading magic, zero flags). */
  def readFooter(fs: FileSystem, path: Path): (Map[String, String], Seq[PuffinBlobMeta]) = {
    implicit val fmts: Formats = DefaultFormats
    val len = fs.getFileStatus(path).getLen
    val in  = fs.open(path)
    try {
      def bytesAt(pos: Long, n: Int): Array[Byte] = {
        val b = new Array[Byte](n); in.readFully(pos, b); b
      }
      require(bytesAt(0, 4).sameElements(Magic), s"$path: missing leading Puffin magic")
      require(bytesAt(len - 4, 4).sameElements(Magic), s"$path: missing trailing magic")
      val flags = bytesAt(len - 8, 4)
      require(flags.forall(_ == 0), s"$path: compressed footers not supported")
      val payloadSize = java.nio.ByteBuffer.wrap(bytesAt(len - 12, 4))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      val payloadStart = len - 12 - payloadSize
      require(bytesAt(payloadStart - 4, 4).sameElements(Magic),
        s"$path: missing footer-start magic")
      val md = JsonMethods.parse(new String(bytesAt(payloadStart, payloadSize), "UTF-8"))
      val fileProps = (md \ "properties").extractOpt[Map[String, String]].getOrElse(Map.empty)
      val blobs = (md \ "blobs").extract[List[JObject]].map { b =>
        PuffinBlobMeta(
          (b \ "type").extract[String],
          (b \ "fields").extract[List[Int]],
          (b \ "snapshot-id").extract[Long],
          (b \ "sequence-number").extract[Long],
          (b \ "offset").extract[Long],
          (b \ "length").extract[Long],
          (b \ "properties").extractOpt[Map[String, String]].getOrElse(Map.empty))
      }
      (fileProps, blobs)
    } finally in.close()
  }

  /** Fetch one blob's payload bytes by its footer entry — a ranged read
    * of exactly `length` bytes. */
  def readBlob(fs: FileSystem, path: Path, meta: PuffinBlobMeta): Array[Byte] = {
    val in = fs.open(path)
    try {
      val b = new Array[Byte](meta.length.toInt)
      in.readFully(meta.offset, b)
      b
    } finally in.close()
  }
}
