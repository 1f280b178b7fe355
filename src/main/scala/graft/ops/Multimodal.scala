package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata. The image path is REAL as of
  * round 6: mm03/mm04 generate deterministic grayscale PNGs per document,
  * push the actual PNG bytes through the binary column, and decode them
  * with `javax.imageio` (JDK-native, no external media libs) — the oracle
  * verifies real pixel statistics by recomputing them from the generative
  * formula, which only agrees if the codec round-trip is lossless and the
  * decode is honest.
  *
  * The Spark-side plumbing: binary schema, per-partition batch iteration
  * (`mapPartitions` over a typed Dataset — the Scala analogue of Python's
  * `mapInPandas` batch shape), codegen'd binary expressions for the
  * metadata path (mm01/mm02 run on utf-8 text payloads, the deterministic
  * bytes both engines can hash).
  *
  * Scale: all per-row map work, no shuffle; partition sizing, not operator
  * design, is the 100 TB knob here.
  */
object Multimodal {

  /** One media record: opaque payload + metadata, as a training pipeline
    * would model an image/audio blob column. */
  final case class MediaRecord(doc_id: Long, media_type: String, content: Array[Byte])

  /** documents -> binary media records (utf-8 payload). */
  def mediaFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  // -------------------------------------------- real PNG encode / decode

  /** Deterministic per-doc image geometry + pixel formula — the shared
    * ground truth the DuckDB oracle recomputes arithmetically: a doc's
    * image is `w x h` 8-bit grayscale with
    * `lum(x, y) = (doc_id*31 + x*7 + y*13) mod 256`. */
  def imgWidth(docId: Long): Int  = (8 + docId % 9).toInt
  def imgHeight(docId: Long): Int = (8 + (docId / 9) % 7).toInt
  def imgLum(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 13) % 256).toInt

  /** Render the doc's image and encode it as a REAL PNG via javax.imageio
    * (8-bit gray PNG is lossless, so decode recovers the formula bit-for-
    * bit). */
  def encodePng(docId: Long): Array[Byte] = {
    val w   = imgWidth(docId)
    val h   = imgHeight(docId)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val ras = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { ras.setSample(x, y, 0, imgLum(docId, x, y)); x += 1 }
      y += 1
    }
    pngBytes(img)
  }

  /** PNG-encode via an in-memory image stream: ImageIO's default stream
    * cache is a TEMP FILE per call — per-row disk IO that dominated the
    * first mm04 bench (5.2 s at sf0.1); the memory-cached stream removes
    * it without touching global ImageIO state. */
  def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
    out.toByteArray
  }

  /** Memory-cached PNG read (same rationale as [[pngBytes]]).
    * `ImageIO.read(ImageInputStream)` closes the stream itself. */
  def readPng(content: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(content)))

  /** Real decode: PNG bytes -> (width, height, sum of luminance, count of
    * pixels >= 128). Statistics come from the DECODED raster, so a broken
    * codec or lossy round-trip diverges from the oracle. */
  def decodePng(content: Array[Byte]): (Int, Int, Long, Long) = {
    val img = readPng(content)
    val ras = img.getRaster
    var sum = 0L; var bright = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val v = ras.getSample(x, y, 0)
        sum += v; if (v >= 128) bright += 1
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, sum, bright)
  }

  /** Nearest-neighbor resize over a DECODED raster: out(x,y) = in(x*w div
    * tw, y*h div th) — pure integer sampling, so the oracle can replay it
    * from the pixel formula. */
  def resizeNearest(img: java.awt.image.BufferedImage, tw: Int, th: Int): java.awt.image.BufferedImage = {
    val out  = new java.awt.image.BufferedImage(tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val ir   = img.getRaster
    val or   = out.getRaster
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        or.setSample(x, y, 0, ir.getSample(x * img.getWidth / tw, y * img.getHeight / th, 0))
        x += 1
      }
      y += 1
    }
    out
  }

  /** documents -> REAL PNG payload column (doc_id, media_type, content). */
  def pngFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, "image/png", encodePng(id))))
      .toDF("doc_id", "media_type", "content")
  }

  /** Frame sampling: cut the payload into fixed-size frames and keep every
    * `every`-th one. Emits (doc_id, frame_idx, frame) rows — the exploded
    * shape a video pipeline feeds to per-frame models. Pure per-row fan-out:
    * distributes with the scan, no shuffle. */
  def frameSample(s: SparkSession, d: String, frameBytes: Int = 16, every: Int = 4): DataFrame = {
    import s.implicits._
    mediaFrame(s, d)
      .as[MediaRecord]
      .flatMap { r =>
        r.content.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % every == 0 => (r.doc_id, idx, frame)
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
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

  /** Frame-sampling through the oracle: every 4th 16-byte frame, hex'd. */
  private def frames(s: SparkSession, d: String): DataFrame =
    frameSample(s, d, frameBytes = 16, every = 4)
      .select(col("doc_id"), col("frame_idx"),
        lower(hex(col("frame"))).as("frame_hex"))
      .orderBy("doc_id", "frame_idx")

  private val framesOracle =
    """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
      idx AS (SELECT doc_id, hx, unnest(range(0, CAST(ceil(len(hx) / 32.0) AS INT))) AS i FROM h)
      SELECT doc_id, CAST(i AS INT) AS frame_idx, lower(substr(hx, CAST(i * 32 + 1 AS INT), 32)) AS frame_hex
      FROM idx WHERE i % 4 = 0 ORDER BY doc_id, frame_idx"""

  /** REAL image decode through the gate: [[pngFrame]] puts actual PNG
    * bytes in the binary column; this query decodes every payload with
    * `javax.imageio` and reports the decoded geometry + pixel statistics,
    * plus the first 8 payload bytes hex'd via the codegen'd binary
    * expression path (must equal the PNG magic). The oracle recomputes
    * width/height/sum/bright from the generative pixel formula — the two
    * can only agree if the PNG encode→decode round-trip is lossless and
    * the raster is actually read. Per-row map work, no shuffle. */
  private def decoded(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngFrame(s, d)
      .select(col("doc_id"), col("content"),
        lower(hex(substring(col("content"), 1, 8))).as("header_hex"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, png, header) =>
        val (w, h, sum, bright) = decodePng(png)
        (id, header, w.toLong, h.toLong, sum, bright)
      })
      .toDF("doc_id", "header_hex", "width", "height", "sum_lum", "n_bright")
      .orderBy("doc_id")
  }

  private val decodedOracle =
    """WITH g AS (
        SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 7 AS h
        FROM documents),
      px AS (
        SELECT g.doc_id, g.w, g.h,
               (g.doc_id * 31 + x.i * 7 + y.j * 13) % 256 AS lum
        FROM g
        JOIN range(0, 16) x(i) ON x.i < g.w
        JOIN range(0, 14) y(j) ON y.j < g.h)
      SELECT doc_id, '89504e470d0a1a0a' AS header_hex,
             CAST(ANY_VALUE(w) AS BIGINT) AS width,
             CAST(ANY_VALUE(h) AS BIGINT) AS height,
             CAST(SUM(lum) AS BIGINT) AS sum_lum,
             CAST(COUNT(*) FILTER (WHERE lum >= 128) AS BIGINT) AS n_bright
      FROM px GROUP BY doc_id ORDER BY doc_id"""

  /** REAL resize through the gate: decode the PNG, nearest-neighbor
    * downscale the raster to 8x8, RE-ENCODE the result as PNG, decode it
    * AGAIN, and report the second decode's statistics — the full
    * decode→transform→encode→decode chain a thumbnailing pipeline runs.
    * The oracle replays the integer sampling (`src = out*dim div 8`) over
    * the pixel formula, so any loss anywhere in the double round-trip
    * breaks the hash. */
  private val resizeTo = 8

  private def resized(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngFrame(s, d)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, png) =>
        val small = resizeNearest(readPng(png), resizeTo, resizeTo)
        val (w, h, sum, bright) = decodePng(pngBytes(small))
        (id, w.toLong, h.toLong, sum, bright)
      })
      .toDF("doc_id", "out_w", "out_h", "sum_lum", "n_bright")
      .orderBy("doc_id")
  }

  private val resizedOracle =
    s"""WITH g AS (
        SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 7 AS h
        FROM documents),
      px AS (
        SELECT g.doc_id,
               (g.doc_id * 31 + ((x.i * g.w) // $resizeTo) * 7
                 + ((y.j * g.h) // $resizeTo) * 13) % 256 AS lum
        FROM g, range(0, $resizeTo) x(i), range(0, $resizeTo) y(j))
      SELECT doc_id,
             CAST($resizeTo AS BIGINT) AS out_w, CAST($resizeTo AS BIGINT) AS out_h,
             CAST(SUM(lum) AS BIGINT) AS sum_lum,
             CAST(COUNT(*) FILTER (WHERE lum >= 128) AS BIGINT) AS n_bright
      FROM px GROUP BY doc_id ORDER BY doc_id"""

  // ------------------------------------------------ shard packing

  private val shardBytes = 4096L

  /** WebDataset-style shard assignment: whole media files binned into
    * size-bounded shards per modality, in deterministic doc_id order —
    * the layout step that turns a curated corpus into the tar-shard
    * files a training job streams. Size-banded semantics: a file's shard
    * is floor(bytes-before-it / capacity), so shards fill to ~capacity
    * and the assignment is a pure function of the corpus (no RNG, stable
    * under re-runs).
    *
    * Scale shape: a TWO-PASS prefix sum, not a single-partition window —
    * doc_ids range-bucket (monotone `doc_id div 2^16`), the within-bucket
    * running sum is a bucket-partitioned window (parallel across buckets),
    * and bucket base offsets come from prefix-summing the per-bucket
    * totals (one row per bucket — a constant-size window) broadcast back.
    * `cum_before = bucket_offset + within_bucket_cum` is exactly the
    * global ordered prefix sum, with no serialization point at any corpus
    * size (measured at 10× sf0.1: naive per-modality window 38.7 s,
    * this shape 1.0 s). */
  private def shardPack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = mediaFrame(s, d)
      .select(col("doc_id"), col("media_type"),
        octet_length(col("content")).cast("long").as("n_bytes"))
      .withColumn("bucket", expr("doc_id div 65536"))
    val wIn = Window.partitionBy("media_type", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.partitionBy("media_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sized.groupBy("media_type", "bucket")
      .agg(sum("n_bytes").as("bucket_total"))
      .withColumn("bucket_off", coalesce(sum("bucket_total").over(wOff), lit(0L)))
      .select("media_type", "bucket", "bucket_off")
    sized
      .withColumn("cum_in", coalesce(sum("n_bytes").over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq("media_type", "bucket"))
      .withColumn("cum_before", col("bucket_off") + col("cum_in"))
      .withColumn("shard", expr(s"cum_before div $shardBytes"))
      .groupBy("media_type", "shard")
      .agg(
        count(lit(1)).as("n_files"),
        sum("n_bytes").as("shard_size"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .select(col("media_type"), col("shard").cast("long").as("shard"),
        col("n_files"), col("shard_size").cast("long").as("shard_size"),
        col("first_doc"), col("last_doc"))
      .orderBy("media_type", "shard")
  }

  private val shardPackOracle =
    s"""WITH m AS (
        SELECT doc_id, 'text/plain' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents),
      c AS (
        SELECT *, COALESCE(SUM(n_bytes) OVER (
                 PARTITION BY media_type ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM m),
      sh AS (SELECT *, cum_before // $shardBytes AS shard FROM c)
      SELECT media_type, CAST(shard AS BIGINT) AS shard,
             COUNT(*) AS n_files,
             CAST(SUM(n_bytes) AS BIGINT) AS shard_size,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM sh GROUP BY media_type, shard ORDER BY media_type, shard"""

  // --------------------------------------------- modality interleaving

  /** Balanced modality interleave — the batch-assembly step that feeds a
    * multimodal trainer alternating text/image items deterministically.
    * The key scale property: the global order is PURE ARITHMETIC, not a
    * global sort — each item's position is `2·(rank_in_modality−1) +
    * modality_index`, and the per-modality rank is itself a TWO-LEVEL
    * computation (item_id range buckets → bucket-local row_number +
    * broadcast prefix-summed bucket counts), so there is no
    * one-partition-per-modality window wall at any corpus size (the same
    * rewrite that took mm05 from 38.7 s to 1.0 s at 10×). The epoch is
    * truncated to the smaller modality (standard balanced-sampling
    * behavior). Gate output: the first 256 interleave positions. */
  private def interleave(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val text = Tables.documents(s, d)
      .select(col("doc_id").as("item_id"), lit("text").as("modality"))
    val img = Tables.embeddings(s, d)
      .select(col("vec_id").as("item_id"), lit("image").as("modality"))
    val u = text.unionByName(img)
      .withColumn("bucket", expr("item_id div 65536"))
    val wIn = Window.partitionBy("modality", "bucket").orderBy("item_id")
    val wOff = Window.partitionBy("modality").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = u.groupBy("modality", "bucket").agg(count(lit(1)).as("nb"))
      .withColumn("off", coalesce(sum("nb").over(wOff), lit(0L)))
      .select("modality", "bucket", "off")
    val ranked = u
      .withColumn("r_in", row_number().over(wIn).cast("long"))
      .join(broadcast(offs), Seq("modality", "bucket"))
      .withColumn("rank_m", col("off") + col("r_in"))
    val nMin = u.groupBy("modality").agg(count(lit(1)).as("n"))
      .agg(min("n").as("n_min"))
    ranked.crossJoin(nMin)
      .filter(col("rank_m") <= col("n_min"))
      .withColumn("pos",
        (col("rank_m") - 1) * 2 + when(col("modality") === "image", 1L).otherwise(0L))
      .filter(col("pos") < 256)
      .select(col("pos"), expr("pos div 8").as("batch_id"), col("modality"), col("item_id"))
      .orderBy("pos")
  }

  private val interleaveOracle =
    """WITH t AS (SELECT doc_id AS item_id, 'text' AS modality FROM documents),
      i AS (SELECT vec_id AS item_id, 'image' AS modality FROM embeddings),
      u AS (SELECT * FROM t UNION ALL SELECT * FROM i),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY modality ORDER BY item_id)
                        AS BIGINT) AS rank_m FROM u),
      n AS (SELECT MIN(n) AS n_min
            FROM (SELECT modality, COUNT(*) AS n FROM u GROUP BY 1)),
      p AS (SELECT item_id, modality,
                   (rank_m - 1) * 2 + CASE WHEN modality = 'image' THEN 1 ELSE 0 END AS pos
            FROM r CROSS JOIN n WHERE rank_m <= n_min)
      SELECT pos, pos // 8 AS batch_id, modality, item_id
      FROM p WHERE pos < 256 ORDER BY pos"""

  // --------------------------- contrastive pair construction audit

  /** Media↔embedding PAIR construction — the contrastive-training input
    * table (CLIP-style): each payload joins its embedding row on id, gets
    * a deterministic train/val split (doc_id mod 10, zero RNG), and the
    * audit aggregates per (label, split): pair count, total payload
    * bytes, and the summed embedding norm (4dp-quantized then
    * DECIMAL-summed, so partial-merge order can't move the hash). At
    * 100 TB both sides are bucketed by id, so the pairing join is
    * co-partitioned; here it is one equi-join + one tiny aggregate. */
  private def pairAudit(s: SparkSession, d: String): DataFrame = {
    val media = mediaFrame(s, d)
      .select(col("doc_id"), octet_length(col("content")).cast("long").as("nbytes"))
    val embs = Tables.embeddings(s, d).select(
      col("vec_id"), col("label"),
      sqrt(expr("aggregate(embedding, CAST(0 AS DOUBLE), " +
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")).as("nrm"))
    media.join(embs, col("doc_id") === col("vec_id"))
      .withColumn("split",
        when(pmod(col("doc_id"), lit(10L)) < 8, "train").otherwise("val"))
      .groupBy("label", "split")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum("nbytes").as("total_bytes"),
        round(sum(round(col("nrm"), 4).cast("decimal(12,4)")), 4).cast("double").as("sum_norm"))
      .orderBy("label", "split")
  }

  private val pairAuditOracle =
    """WITH e AS (
        SELECT vec_id, d, CAST(embedding[d + 1] AS DOUBLE) AS x
        FROM embeddings, range(64) t(d)),
      nrm AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM e GROUP BY vec_id),
      m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nbytes FROM documents),
      pairs AS (
        SELECT em.label,
               CASE WHEN m.doc_id % 10 < 8 THEN 'train' ELSE 'val' END AS split,
               m.nbytes, n.nrm
        FROM m
        JOIN embeddings em ON m.doc_id = em.vec_id
        JOIN nrm n ON n.vec_id = em.vec_id)
      SELECT label, split, COUNT(*) AS n_pairs,
             CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
             CAST(ROUND(SUM(CAST(ROUND(nrm, 4) AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_norm
      FROM pairs GROUP BY label, split ORDER BY label, split"""

  // ---------------------------------------------------- audio frame energy

  /** Deterministic per-doc PCM16 waveform — the audio analogue of the
    * [[imgLum]] formula, and the shared ground truth the oracle replays:
    * `s(t) = ((doc_id*17 + t*t*3 + t*11) mod 4096) - 2048` over 1024
    * samples, serialized little-endian (the WAV data-chunk layout). */
  val audioSamples = 1024
  val audioFrame   = 256
  def audioSample(docId: Long, t: Int): Int =
    ((docId * 17 + t.toLong * t * 3 + t * 11) % 4096).toInt - 2048

  def encodePcm(docId: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(audioSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var t = 0
    while (t < audioSamples) { b.putShort(audioSample(docId, t).toShort); t += 1 }
    b.array()
  }

  /** Per-frame loudness over REAL bytes: each doc carries its 2 KiB PCM16
    * payload in the binary column; this query re-parses the little-endian
    * samples FROM THE BYTES (not the formula), windows them into 256-sample
    * frames, and reports exact integer energy (Σ|s|) and peak per frame —
    * the VAD/segmentation front-end of an audio curation pipeline. The
    * oracle replays the generative formula arithmetically, so byte order,
    * sign handling, and framing are all under test. Pure per-row fan-out
    * (4 frames/doc), no shuffle until the final ORDER BY. */
  private def audioEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, encodePcm(id))))
      .toDF("doc_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, pcm) =>
        val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        (0 until audioSamples / audioFrame).map { f =>
          var energy = 0L; var peak = 0L
          var i = 0
          while (i < audioFrame) {
            val v = math.abs(bb.getShort((f * audioFrame + i) * 2).toLong)
            energy += v; if (v > peak) peak = v
            i += 1
          }
          (id, f.toLong, energy, peak)
        }
      })
      .toDF("doc_id", "frame", "energy", "peak")
      .orderBy("doc_id", "frame")
  }

  private val audioEnergyOracle =
    """WITH t AS (
        SELECT doc_id, i, i // 256 AS frame,
               ABS((doc_id * 17 + i * i * 3 + i * 11) % 4096 - 2048) AS a
        FROM documents, range(0, 1024) r(i))
      SELECT doc_id, CAST(frame AS BIGINT) AS frame,
             CAST(SUM(a) AS BIGINT) AS energy,
             CAST(MAX(a) AS BIGINT) AS peak
      FROM t GROUP BY doc_id, frame ORDER BY doc_id, frame"""

  // ------------------------------------------------ luminance histogram

  /** 4-bin luminance histogram from the DECODED raster (not the formula):
    * the brightness-profile feature an image-curation gate computes to
    * drop all-black/all-white frames. Runs the real PNG decode per row
    * (mm03's codec path) and bins pixels at 64-level boundaries; the
    * oracle recomputes the bins arithmetically from the generative
    * formula, so binning is only green if the decode is lossless. Map-
    * only, no shuffle. */
  private def lumHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngFrame(s, d)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, png) =>
        val img  = readPng(png)
        val ras  = img.getRaster
        val bins = new Array[Long](4)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            bins(ras.getSample(x, y, 0) / 64) += 1
            x += 1
          }
          y += 1
        }
        (id, bins(0), bins(1), bins(2), bins(3))
      })
      .toDF("doc_id", "b0", "b1", "b2", "b3")
      .orderBy("doc_id")
  }

  private val lumHistogramOracle =
    """WITH g AS (
        SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 7 AS h
        FROM documents),
      px AS (
        SELECT g.doc_id,
               ((g.doc_id * 31 + x.i * 7 + y.j * 13) % 256) // 64 AS bin
        FROM g
        JOIN range(0, 16) x(i) ON x.i < g.w
        JOIN range(0, 14) y(j) ON y.j < g.h)
      SELECT doc_id,
             CAST(COUNT(*) FILTER (WHERE bin = 0) AS BIGINT) AS b0,
             CAST(COUNT(*) FILTER (WHERE bin = 1) AS BIGINT) AS b1,
             CAST(COUNT(*) FILTER (WHERE bin = 2) AS BIGINT) AS b2,
             CAST(COUNT(*) FILTER (WHERE bin = 3) AS BIGINT) AS b3
      FROM px GROUP BY doc_id ORDER BY doc_id"""

  /** mm13: perceptual difference-hash (dHash) image near-dup — the
    * standard cheap visual fingerprint: decode the REAL PNG, nearest-
    * neighbor downsample to 9×8 (the mm04 kernel), set bit (y·8+x) when
    * the right neighbor is brighter, giving a 63-bit signature (bit 63
    * dropped so the value stays non-negative in signed 64-bit on BOTH
    * engines). Near-dup candidates come from a 4×16-bit band equi-join —
    * the dd08 pigeonhole layout, candidate-proportional, never all-pairs;
    * reported per doc as the count of band-sharing partners. The oracle
    * replays decode+resize+hash ARITHMETICALLY from the generative pixel
    * formula, so it only agrees if the codec, the resampler and the bit
    * packing are all honest. Per-row map work + one (band, bval) shuffle. */
  private def dhashQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashes = pngFrame(s, d)
      .select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, png) =>
        val ras = resizeNearest(readPng(png), 9, 8).getRaster
        var hsh = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (!(x == 7 && y == 7) &&
              ras.getSample(x + 1, y, 0) > ras.getSample(x, y, 0))
              hsh |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (id, hsh)
      })
      .toDF("doc_id", "dhash")
      .persist() // two join sides + the final join-back: decode ONCE
    val bands = hashes
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 3), b -> shiftright(dhash, b * 16) & 65535)")))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "bval")
    // hot-bucket skip (standard LSH hygiene, the dd16 df-cap): dHash is
    // LOW-entropy by design — gradient-dominated images share band
    // values en masse, and a bucket of g docs costs g² join rows. A
    // bucket larger than 64 carries no near-dup signal (it's the
    // degenerate "everything looks alike" class) and is dropped BEFORE
    // the self-join, so candidate cost stays bucket-bounded at any
    // corpus size (measured: un-capped, the 10× corpus exploded
    // quadratically).
    val bucketSizes = bands.groupBy("band_id", "bval")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= 64)
    val coldBands = bands.join(bucketSizes, Seq("band_id", "bval"))
      .select("doc_id", "band_id", "bval")
    val partners = coldBands.as("a")
      .join(coldBands.as("b"),
        col("a.band_id") === col("b.band_id") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(countDistinct(col("b.doc_id")).as("n_band_partners"))
    val out = hashes.join(partners, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_band_partners"))
      .orderBy("doc_id")
    try out.localCheckpoint(eager = true)
    finally hashes.unpersist(blocking = false)
  }

  private val dhashOracle =
    """WITH g AS (
        SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 9) % 7 AS h FROM documents),
      px AS (
        SELECT doc_id, w, h, tx.x, ty.y
        FROM g, range(8) tx(x), range(8) ty(y)),
      bitv AS (
        SELECT doc_id, CASE WHEN NOT (x = 7 AND y = 7)
            AND ((doc_id*31 + (((x+1)*w)//9)*7 + ((y*h)//8)*13) % 256)
              > ((doc_id*31 + ((x*w)//9)*7 + ((y*h)//8)*13) % 256)
          THEN (CAST(1 AS BIGINT) << CAST(y*8 + x AS INT)) ELSE 0 END AS v
        FROM px),
      hsh AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS dhash FROM bitv GROUP BY doc_id),
      bands AS (
        SELECT doc_id, b AS band_id, (dhash >> CAST(b*16 AS INT)) & 65535 AS bval
        FROM hsh, range(4) r(b)),
      cold AS (
        SELECT band_id, bval FROM bands
        GROUP BY 1, 2 HAVING COUNT(*) <= 64),
      cb AS (SELECT b.* FROM bands b JOIN cold USING (band_id, bval)),
      p AS (
        SELECT a.doc_id, COUNT(DISTINCT b.doc_id) AS n_band_partners
        FROM cb a JOIN cb b
          ON a.band_id = b.band_id AND a.bval = b.bval AND a.doc_id <> b.doc_id
        GROUP BY 1)
      SELECT h.doc_id, h.dhash,
             CAST(COALESCE(p.n_band_partners, 0) AS BIGINT) AS n_band_partners
      FROM hsh h LEFT JOIN p ON h.doc_id = p.doc_id ORDER BY h.doc_id"""

  def all: Seq[Q] = Seq(
    Q("mm01_meta", meta, Some(metaOracle)),
    Q("mm02_frame_sample", frames, Some(framesOracle)),
    Q("mm03_decode", decoded, Some(decodedOracle)),
    Q("mm04_resize", resized, Some(resizedOracle)),
    Q("mm05_shard_pack", shardPack, Some(shardPackOracle)),
    Q("mm06_interleave", interleave, Some(interleaveOracle)),
    Q("mm07_pair_audit", pairAudit, Some(pairAuditOracle)),
    Q("mm08_audio_energy", audioEnergy, Some(audioEnergyOracle)),
    Q("mm09_lum_histogram", lumHistogram, Some(lumHistogramOracle)),
    Q("mm10_aspect_bucket", aspectBucket, Some(aspectBucketOracle)),
    Q("mm11_shot_boundary", shotBoundary, Some(shotBoundaryOracle)),
    Q("mm12_audio_clipping", audioClipping, Some(audioClippingOracle)),
    Q("mm13_dhash", dhashQ, Some(dhashOracle))
  )

  /** Audio-quality gate over the PCM payload: per-doc clipping rate
    * (samples at or beyond ±2000 of the ±2048 range, in basis points),
    * DC offset (the exact signed sample sum — a nonzero bias means a
    * broken recording chain), and peak amplitude. Like mm08, the samples
    * are re-parsed little-endian FROM THE BYTES while the oracle replays
    * the generative formula — sign handling across the byte boundary is
    * exactly what this gates. Map-only per-row work, no shuffle. */
  private val clipLevel = 2000L

  private def audioClipping(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val bb = java.nio.ByteBuffer.wrap(encodePcm(id)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var clipped = 0L; var dc = 0L; var peak = 0L
        var i = 0
        while (i < audioSamples) {
          val v = bb.getShort(i * 2).toLong
          val a = math.abs(v)
          if (a >= clipLevel) clipped += 1
          dc += v; if (a > peak) peak = a
          i += 1
        }
        (id, clipped * 10000 / audioSamples, dc, peak)
      })
      .toDF("doc_id", "clip_bp", "dc_offset", "peak")
      .orderBy("doc_id")
  }

  private val audioClippingOracle =
    s"""WITH t AS (
        SELECT doc_id,
               (doc_id * 17 + i * i * 3 + i * 11) % 4096 - 2048 AS s
        FROM documents, range(0, 1024) r(i))
      SELECT doc_id,
             CAST(SUM(CASE WHEN ABS(s) >= $clipLevel THEN 1 ELSE 0 END) * 10000 // 1024 AS BIGINT) AS clip_bp,
             CAST(SUM(s) AS BIGINT) AS dc_offset,
             CAST(MAX(ABS(s)) AS BIGINT) AS peak
      FROM t GROUP BY doc_id ORDER BY doc_id"""

  /** Shot-boundary detection over the frame stream: every 16-byte frame
    * gets an integer energy (Σ unsigned byte values); a boundary is a
    * frame-to-frame energy jump above a fixed threshold — the
    * keyframe-selection primitive a video pipeline runs before sampling
    * frames for captioning (mm02 samples blindly every Nth; this samples
    * where content changes). Per-doc report of frame count, boundary
    * count, and the largest jump, all exact integers. Frame fan-out
    * distributes with the scan; the only shuffle is the doc-keyed lag
    * window, whose partitions are frames-per-doc — bounded by media
    * length, never by corpus size. */
  private val shotThreshold = 200L

  private def shotBoundary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
    frameSample(s, d, frameBytes = 16, every = 1)
      .as[(Long, Int, Array[Byte])]
      .map { case (id, idx, frame) =>
        var e = 0L; var i = 0
        while (i < frame.length) { e += (frame(i) & 0xff); i += 1 }
        (id, idx, e)
      }
      .toDF("doc_id", "frame_idx", "energy")
      .withColumn("delta", abs(col("energy") - lag("energy", 1).over(byDoc)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        sum((col("delta") > shotThreshold).cast("long")).as("n_boundaries"),
        coalesce(max("delta"), lit(0L)).as("max_delta"))
      .orderBy("doc_id")
  }

  private val shotBoundaryOracle =
    s"""WITH f AS (
        SELECT doc_id, CAST(i AS INT) AS frame_idx,
               CAST(list_sum(list_transform(
                 range(i * 16 + 1, least(len(text), i * 16 + 16) + 1),
                 j -> unicode(substr(text, CAST(j AS INT), 1)))) AS BIGINT) AS energy
        FROM (SELECT doc_id, text,
                     unnest(range(0, CAST(ceil(len(text) / 16.0) AS INT))) AS i
              FROM documents)),
      d AS (
        SELECT doc_id, frame_idx,
               ABS(energy - lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS delta
        FROM f)
      SELECT doc_id, COUNT(*) AS n_frames,
             CAST(SUM(CASE WHEN delta > $shotThreshold THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
             CAST(COALESCE(MAX(delta), 0) AS BIGINT) AS max_delta
      FROM d GROUP BY doc_id ORDER BY doc_id"""

  /** Aspect-ratio bucketing (the SDXL/NaViT batching recipe): decode every
    * image's REAL dimensions from its PNG payload, bucket by integer
    * aspect-ratio percent `w*100 div h`, and report each bucket's
    * population, its batch envelope (max w × max h), and the padding waste
    * a batcher would pay there — `Σ(max_w·max_h − w·h)` — the number this
    * op exists to minimize. The oracle recomputes everything from the
    * generative geometry formula, so the bucketing is gated on the decode
    * path being real. Per-row decode then one tiny keyed shuffle over a
    * bounded bucket space: map-side combine makes the agg free at scale. */
  private def aspectBucket(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pngFrame(s, d)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, png) =>
        val img = readPng(png)
        (id, img.getWidth.toLong, img.getHeight.toLong)
      })
      .toDF("doc_id", "w", "h")
      .withColumn("ar_pct", expr("w * 100 div h"))
      .groupBy("ar_pct")
      .agg(
        count(lit(1)).as("n_imgs"),
        max("w").as("max_w"),
        max("h").as("max_h"),
        sum(expr("w * h")).as("sum_px"))
      .withColumn("pad_waste_px", expr("n_imgs * max_w * max_h - sum_px"))
      .select("ar_pct", "n_imgs", "max_w", "max_h", "sum_px", "pad_waste_px")
      .orderBy("ar_pct")
  }

  private val aspectBucketOracle =
    """WITH g AS (
        SELECT doc_id,
               CAST(8 + doc_id % 9 AS BIGINT) AS w,
               CAST(8 + (doc_id // 9) % 7 AS BIGINT) AS h
        FROM documents),
      b AS (SELECT doc_id, w, h, w * 100 // h AS ar_pct FROM g)
      SELECT ar_pct, COUNT(*) AS n_imgs,
             CAST(MAX(w) AS BIGINT) AS max_w,
             CAST(MAX(h) AS BIGINT) AS max_h,
             CAST(SUM(w * h) AS BIGINT) AS sum_px,
             CAST(COUNT(*) * MAX(w) * MAX(h) - SUM(w * h) AS BIGINT) AS pad_waste_px
      FROM b GROUP BY ar_pct ORDER BY ar_pct"""
}
