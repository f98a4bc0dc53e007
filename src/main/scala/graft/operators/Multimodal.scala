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
  // STUB DECODER — deterministic fake. Replace the body with a real codec;
  // signature and batching stay unchanged.
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
        val (w, h) = decodeStub(r.payload)
        r.copy(width = w, height = h,
          sample_rate = if (r.media_type == "audio") 16000 else -1,
          n_frames = if (r.media_type == "video") 1 + (w % 300) else -1)
      }
    }
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
