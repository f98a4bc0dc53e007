package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing specs: schema, determinism, batching, bucketing.
  * The decode itself is a documented stub; these tests pin the Spark-side
  * contract a real codec would inherit.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(
    spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text").cache()

  test("media table schema: binary payload + typed meta, deterministic types") {
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary")
    assert(schema("media_type") == "string")
    val types = media.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
    // type assignment is a pure function of doc_id
    val again = Multimodal.mediaTable(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    assert(media.select("doc_id", "media_type").exceptAll(
      again.select("doc_id", "media_type")).count() == 0)
  }

  test("decodeMeta fills meta deterministically, partition-count preserved") {
    val d1 = Multimodal.decodeMeta(spark, media).collect().sortBy(_.doc_id)
    val d2 = Multimodal.decodeMeta(spark, media).collect().sortBy(_.doc_id)
    assert(d1.map(r => (r.doc_id, r.width, r.height)).toSeq ==
      d2.map(r => (r.doc_id, r.width, r.height)).toSeq)
    assert(d1.forall(r => r.width >= 64 && r.height >= 64))
    assert(d1.filter(_.media_type == "audio").forall(_.sample_rate == 16000))
    assert(d1.filter(_.media_type == "video").forall(_.n_frames > 0))
    assert(d1.filter(_.media_type == "image").forall(_.n_frames == -1))
  }

  test("feature extraction: fixed dim, deterministic, distributed (no collect in plan)") {
    val f = Multimodal.extractFeatures(spark, media, dim = 16)
    val rows = f.collect()
    assert(rows.forall(_.feature.length == 16))
    val one = rows.find(_.doc_id == 0).get
    val again = Multimodal.extractFeatures(spark, media, dim = 16)
      .filter(col("doc_id") === 0).collect()(0)
    assert(one.feature.toSeq == again.feature.toSeq)
  }

  test("frame sampling explodes only videos with the stride") {
    val decoded = Multimodal.decodeMeta(spark, media)
    val frames = Multimodal.sampleFrames(decoded, everyN = 7)
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("maxi")).collect()
    assert(perDoc.nonEmpty)
    val nFrames = decoded.filter(col("media_type") === "video")
      .select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    perDoc.foreach { r =>
      val expect = (nFrames(r.getLong(0)) + 6) / 7
      assert(r.getLong(1) == expect, s"doc ${r.getLong(0)}")
    }
  }

  test("size buckets are monotone in payload length") {
    val b = Multimodal.withSizeBucket(media, Seq(100, 300))
      .select(length(col("payload")).as("len"), col("size_bucket")).collect()
    b.foreach { r =>
      val len = r.getInt(0); val bucket = r.getInt(1)
      val want = if (len <= 100) 0 else if (len <= 300) 1 else 2
      assert(bucket == want)
    }
  }

  test("image header decoders round-trip the synthetic PNG/GIF/BMP/JPEG payloads") {
    import graft.operators.Multimodal
    for (id <- Seq(0L, 1L, 2L, 3L, 123L, 899L, 1234L)) {
      val expW = (100 + id % 900).toInt
      val expH = (50 + id % 500).toInt
      val expFmt = (id % 4) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "bmp"; case _ => "jpeg"
      }
      assert(Multimodal.decodeImageHeader(Multimodal.syntheticImagePayload(id))
        .contains((expFmt, expW, expH)), s"id=$id")
    }
    // unknown payloads are not mis-detected
    assert(Multimodal.decodeImageHeader("not an image at all".getBytes).isEmpty)
    assert(Multimodal.decodeImageHeader(Array[Byte]()).isEmpty)
  }

  test("WAV header decoder round-trips sample rate and channels") {
    import graft.operators.Multimodal
    for ((rate, ch) <- Seq((16000, 1), (44100, 2), (48000, 6))) {
      assert(Multimodal.decodeWavHeader(Multimodal.syntheticWavPayload(rate, ch))
        .contains((rate, ch)))
    }
    assert(Multimodal.decodeWavHeader("RIFFxxxx not wave".getBytes).isEmpty)
  }
}
