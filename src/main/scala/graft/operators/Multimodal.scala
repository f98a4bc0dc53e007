package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: images/audio/video as opaque `binary` payloads with
  * typed metadata, processed batch-at-a-time per partition.
  *
  * The Spark-side plumbing — schema, typed Dataset, partition-batched
  * processing (the JVM analogue of an Arrow-batched pandas UDF), bucketing
  * by media type/size — is real and tested. The actual codec work is STUBBED
  * (this environment ships no image/audio libraries): `decodeStub` derives
  * deterministic fake dimensions/features from the payload bytes, and is the
  * single clearly-marked seam where a real decoder (e.g. TwelveMonkeys/
  * javacpp-ffmpeg) would plug in.
  */
object Multimodal {

  /** A media row: payload is opaque bytes; meta is typed. */
  final case class MediaRow(
      doc_id: Long,
      media_type: String,              // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, height: Int,         // -1 until decoded
      sample_rate: Int,                // -1 unless audio
      n_frames: Int)                   // -1 unless video

  final case class MediaFeature(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int, height: Int,
      feature: Array[Float])           // fixed-width embedding per asset

  /** Build a media table from any table with an id + string payload column
    * (the fixture path: document text bytes stand in for encoded assets).
    * Deterministic media_type assignment by id.
    */
  def mediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      lit(-1).as("width"), lit(-1).as("height"),
      lit(-1).as("sample_rate"), lit(-1).as("n_frames"))

  // =====================================================================
  // REAL DECODER SEAM — pure-JVM header parsers for the three public image
  // container formats (PNG: IHDR big-endian dims at offset 16/20 after the
  // 8-byte magic; GIF: little-endian u16 logical-screen dims at 6/8; BMP:
  // BITMAPINFOHEADER little-endian i32 dims at 18/22, height negative for
  // top-down rows). decodeMeta dispatches here first and falls back to the
  // deterministic stub for unknown payloads, so the pipeline is total.
  // =====================================================================

  /** Parse (format, width, height) from real image container bytes. */
  def decodeImageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      val w = (u8(16) << 24) | (u8(17) << 16) | (u8(18) << 8) | u8(19)
      val h = (u8(20) << 24) | (u8(21) << 16) | (u8(22) << 8) | u8(23)
      Some(("png", w, h))
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      Some(("gif", u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8)))
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val w = u8(18) | (u8(19) << 8) | (u8(20) << 16) | (u8(21) << 24)
      val h = u8(22) | (u8(23) << 8) | (u8(24) << 16) | (u8(25) << 24)
      Some(("bmp", w, math.abs(h)))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk FF-marker segments to the first SOFn frame header
      // (C0-CF except C4/C8/CC which carry no frame dims); dims are
      // big-endian u16 at +5 (height) / +7 (width) into the segment
      var i = 2
      while (i + 9 <= b.length && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          val h = (u8(i + 5) << 8) | u8(i + 6)
          val w = (u8(i + 7) << 8) | u8(i + 8)
          return Some(("jpeg", w, h))
        }
        i += 2 + ((u8(i + 2) << 8) | u8(i + 3))
      }
      None
    } else None
  }

  /** Parse (sample_rate, n_channels) from a WAV (RIFF) container header —
    * "RIFF"...."WAVE" magic, "fmt " chunk: channels u16 LE at 22, sample
    * rate u32 LE at 24. Public container format, pure-JVM.
    */
  def decodeWavHeader(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    if (b.length >= 28 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
        b(12) == 'f' && b(13) == 'm' && b(14) == 't') {
      val channels = u8(22) | (u8(23) << 8)
      val rate = u8(24) | (u8(25) << 8) | (u8(26) << 16) | (u8(27) << 24)
      Some((rate, channels))
    } else None
  }

  /** Deterministic minimal WAV header bytes for fixtures. */
  def syntheticWavPayload(sampleRate: Int, channels: Int): Array[Byte] = {
    val b = new Array[Byte](28)
    "RIFF".getBytes.copyToArray(b, 0)
    "WAVE".getBytes.copyToArray(b, 8)
    "fmt ".getBytes.copyToArray(b, 12)
    b(22) = channels.toByte; b(23) = (channels >>> 8).toByte
    for (i <- 0 until 4) b(24 + i) = (sampleRate >>> (8 * i)).toByte
    b
  }

  /** Deterministic minimal container bytes for fixtures: a valid
    * PNG/GIF/BMP/JPEG header carrying dims derived from the id (format =
    * id mod 4). The GATE decodes these with [[decodeImageHeader]] — real
    * byte parsing, synthetic payload.
    */
  def syntheticImagePayload(id: Long): Array[Byte] = {
    val w = (100 + id % 900).toInt
    val h = (50 + id % 500).toInt
    (id % 4) match {
      case 0 => // PNG: magic + IHDR length/type + w/h big-endian
        val b = new Array[Byte](24)
        val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        magic.zipWithIndex.foreach { case (v, i) => b(i) = v.toByte }
        b(8) = 0; b(9) = 0; b(10) = 0; b(11) = 13
        b(12) = 'I'; b(13) = 'H'; b(14) = 'D'; b(15) = 'R'
        for (i <- 0 until 4) { b(16 + i) = (w >>> (24 - 8 * i)).toByte; b(20 + i) = (h >>> (24 - 8 * i)).toByte }
        b
      case 1 => // GIF89a: little-endian u16 dims
        val b = new Array[Byte](10)
        "GIF89a".getBytes.copyToArray(b)
        b(6) = w.toByte; b(7) = (w >>> 8).toByte
        b(8) = h.toByte; b(9) = (h >>> 8).toByte
        b
      case 2 => // BMP: "BM" + BITMAPINFOHEADER dims at 18/22 (LE)
        val b = new Array[Byte](26)
        b(0) = 'B'; b(1) = 'M'
        for (i <- 0 until 4) { b(18 + i) = (w >>> (8 * i)).toByte; b(22 + i) = (h >>> (8 * i)).toByte }
        b
      case _ => // JPEG: SOI + APP0 (to exercise the marker walk) + SOF0 dims
        val b = new Array[Byte](2 + 6 + 9)
        b(0) = 0xff.toByte; b(1) = 0xd8.toByte
        b(2) = 0xff.toByte; b(3) = 0xe0.toByte // APP0, length 4 (2 payload)
        b(4) = 0; b(5) = 4; b(6) = 'J'; b(7) = 'F'
        b(8) = 0xff.toByte; b(9) = 0xc0.toByte // SOF0, baseline frame
        b(10) = 0; b(11) = 7 // segment length
        b(12) = 8 // bit depth
        b(13) = (h >>> 8).toByte; b(14) = h.toByte
        b(15) = (w >>> 8).toByte; b(16) = w.toByte
        b
    }
  }

  // =====================================================================
  // STUB DECODER — deterministic fake for payloads that are not real image
  // containers (this sandbox ships no full codec libs); the header parsers
  // above are the real seam.
  // =====================================================================
  private[graft] def decodeStub(payload: Array[Byte]): (Int, Int) = {
    // ??? <- real image decode goes here; deterministic fake for plumbing:
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(payload.length, 64)) { h = 31 * h + payload(i); i += 1 }
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    (w, ht)
  }

  private[graft] def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real feature extraction (CNN/CLIP/etc.); deterministic fake:
    val out = new Array[Float](dim)
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < payload.length) { h = (h ^ payload(i)) * 0x100000001B3L; out(i % dim) += (h % 1000) / 1000f; i += 1 }
    out
  }

  /** Decode metadata per asset, batch-at-a-time per partition (mapPartitions
    * — the executor-local, iterator-based shape a real decoder needs: one
    * codec/context per partition, not per row; mirrors an Arrow-batched
    * pandas UDF's batch contract).
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init: a real impl would open its codec context here
      rows.map { r =>
        val (w, h) = decodeImageHeader(r.payload)
          .map { case (_, dw, dh) => (dw, dh) }
          .getOrElse(decodeStub(r.payload))
        val rate = decodeWavHeader(r.payload).map(_._1)
          .getOrElse(if (r.media_type == "audio") 16000 else -1)
        r.copy(width = w, height = h,
          sample_rate = rate,
          n_frames = if (r.media_type == "video") 1 + (w % 300) else -1)
      }
    }
  }

  /** Decode (doc_id, fmt, width, height) from real image container bytes,
    * partition-batched like [[decodeMeta]]; unknown payloads yield nulls.
    */
  def decodeImages(spark: SparkSession, df: DataFrame,
                   idCol: String = "doc_id", payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodeImageHeader(payload) match {
          case Some((fmt, w, h)) => (id, fmt, Some(w), Some(h))
          case None => (id, null: String, None: Option[Int], None: Option[Int])
        }
      })
      .toDF(idCol, "fmt", "width", "height")
  }

  /** Feature extraction: fixed-dim float vector per asset, partition-batched. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decodeStub(r.payload)
        MediaFeature(r.doc_id, r.media_type, r.payload.length, w, h, featureStub(r.payload, dim))
      }
    }
  }

  /** Frame sampling for video assets: explode into (doc_id, frame_idx) with a
    * stride — pure plan surgery (explode of a sequence), no decode needed for
    * the index computation; a real pipeline joins frames back to a decoder.
    */
  def sampleFrames(decoded: Dataset[MediaRow], everyN: Int): DataFrame =
    decoded.toDF()
      .filter(col("media_type") === "video" && col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))

  /** Size-bucketed layout for skew-free batch processing: big assets are few
    * but heavy — bucketing by payload size lets the planner co-locate
    * similar-cost rows (write `.partitionBy("size_bucket")` at rest).
    */
  def withSizeBucket(media: DataFrame, bucketEdges: Seq[Int] = Seq(1 << 10, 1 << 16, 1 << 20)): DataFrame = {
    val len = length(col("payload"))
    val bucket = bucketEdges.zipWithIndex.foldRight(lit(bucketEdges.size): org.apache.spark.sql.Column) {
      case ((edge, i), acc) => when(len <= edge, lit(i)).otherwise(acc)
    }
    media.withColumn("size_bucket", bucket)
  }
}
