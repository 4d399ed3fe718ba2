package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed in partition-local batches.
  *
  * Decode is REAL wherever a JDK codec exists: images via [[ImageCodec]]
  * (`javax.imageio` — PNG/JPEG/GIF/BMP: pixel-true dims, raster resize,
  * grid-luminance features), audio via [[AudioCodec]]
  * (`javax.sound.sampled` — WAV/AIFF/AU PCM: RMS-envelope features), and
  * video via multi-frame containers the JDK reads (animated GIF:
  * frame-sampled, mean-pooled luminance features). Payloads no codec
  * claims fall back to [[StubDecoder]]'s deterministic byte-math so the
  * pipeline stays total; the stub keeps every Spark-side concern (schema,
  * payload movement, batch shape) identical to the real path.
  *
  * Scale notes: payloads never pass through a shuffle (feature extraction is
  * a narrow mapPartitions); `targetRecordsPerBatch` bounds peak memory per
  * task the way maxRecordsPerBatch does for arrow-based UDFs.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                               width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 feature: Array[Float])

  /** Deterministic fake decoder: derives a fixed-length feature vector from
    * payload bytes. STUB — replace with a real codec (JPEG decode, PCM
    * frame read) outside this container. */
  object StubDecoder {
    val FeatureDim = 16

    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      if (payload.length > 0) {
        var k = 0
        while (k < FeatureDim) { f(k) /= math.max(1, payload.length / FeatureDim); k += 1 }
      }
      f
    }

    /** Deterministic frame sampling: every `stride`-th byte window stands in
      * for a decoded video frame. */
    def sampleFrames(payload: Array[Byte], frameBytes: Int, maxFrames: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty || frameBytes <= 0) return Seq.empty
      val nFrames = math.min(maxFrames, math.max(1, payload.length / frameBytes))
      val stride = math.max(1, payload.length / nFrames)
      (0 until nFrames).map { i =>
        val start = i * stride
        payload.slice(start, math.min(start + frameBytes, payload.length))
      }
    }
  }

  final case class FrameRecord(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB image resize: deterministic byte-space downsample standing in for
    * a pixel resample — keeps the payload-size contract (output length
    * scales with target area) and the metadata update real. Replace the
    * byte math with a real raster scaler outside this container. */
  def resizeStub(r: MediaRecord, targetW: Int, targetH: Int): MediaRecord = {
    val targetLen = math.max(1, targetW * targetH)
    if (r.payload.length <= targetLen) r // already smaller: payload AND dims unchanged
    else {
      val stride = r.payload.length.toDouble / targetLen
      r.copy(
        payload = Array.tabulate[Byte](targetLen)(i => r.payload((i * stride).toInt)),
        width = targetW, height = targetH)
    }
  }

  /** Per-record resize: REAL raster resample (bilinear, PNG re-encode) when
    * the payload decodes as an image; byte-space [[resizeStub]] otherwise.
    * Mirrors the stub's never-upsample contract: a raster already within
    * the target box passes through unchanged except for pixel-true dims. */
  def resizeRecord(r: MediaRecord, targetW: Int, targetH: Int): MediaRecord =
    if (r.kind != "image") resizeStub(r, targetW, targetH)
    else ImageCodec.decode(r.payload) match {
      case Some(img) if img.getWidth <= targetW && img.getHeight <= targetH =>
        r.copy(width = img.getWidth, height = img.getHeight)
      case Some(img) =>
        r.copy(payload = ImageCodec.resizePng(img, targetW, targetH),
          width = targetW, height = targetH)
      case None => resizeStub(r, targetW, targetH)
    }

  /** Batched resize over a media frame — same narrow, bounded-batch shape
    * as [[extractFeatures]]; payloads never shuffle. */
  def resizeAll(media: Dataset[MediaRecord], targetW: Int, targetH: Int,
                targetRecordsPerBatch: Int = 256): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(targetRecordsPerBatch).flatMap(_.map(resizeRecord(_, targetW, targetH)))
    }
  }

  /** Fill width/height from the REAL image header (header-only probe — no
    * raster decompression; see [[ImageCodec.probeDims]]) and sample_rate
    * from the REAL audio container header ([[AudioCodec.probeMeta]]).
    * Unprobeable payloads keep their declared metadata. The metadata-audit
    * pass a media corpus runs before any decode-heavy stage. */
  def probeImageMeta(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      r.kind match {
        case "image" => ImageCodec.probeDims(r.payload) match {
          case Some((w, h)) => r.copy(width = w, height = h)
          case None => r
        }
        case "audio" => AudioCodec.probeMeta(r.payload) match {
          case Some(m) => r.copy(sample_rate = m.sampleRate)
          case None => r
        }
        case _ => r
      }
    })
  }

  /** Frame sampling as a Dataset operator: each video payload explodes into
    * at most `maxFrames` frame rows, partition-locally (the row count is
    * bounded by maxFrames x input rows; frames never re-shuffle).
    *
    * Payloads the JDK decodes as a multi-frame container (animated GIF)
    * yield REAL evenly-strided frames, PNG-re-encoded with their SOURCE
    * frame index — so downstream feature extraction over the frame rows
    * ([[decodeFeature]] with kind "image") sees true pixels. Everything
    * else falls back to the byte-window stub with dense indices — one
    * schema, the pipeline stays total. */
  def sampleVideoFrames(media: Dataset[MediaRecord], frameBytes: Int,
                        maxFrames: Int): Dataset[FrameRecord] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val real =
        if (r.kind == "video" || r.kind == "image")
          ImageCodec.decodeFrames(r.payload, maxFrames)
        else Seq.empty
      if (real.nonEmpty)
        real.map { case (i, img) =>
          FrameRecord(r.media_id, i, ImageCodec.encodePng(img)) }
      else
        StubDecoder.sampleFrames(r.payload, frameBytes, maxFrames).zipWithIndex
          .map { case (f, i) => FrameRecord(r.media_id, i, f) }
    }
  }

  /** Batched feature extraction over a media frame: narrow mapPartitions,
    * records processed in bounded batches. Decodable images yield REAL
    * pixel features ([[ImageCodec.gridLuminance]], 4×4 grid), decodable
    * audio REAL RMS-envelope features ([[AudioCodec.rmsEnvelope]]),
    * decodable video REAL frame-pooled luminance features — all the same
    * 16-dim schema as the stub; payloads no JDK codec claims get the
    * byte-math stand-in — one schema, no partial rows. */
  def extractFeatures(media: Dataset[MediaRecord],
                      targetRecordsPerBatch: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(targetRecordsPerBatch).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(r.media_id, r.kind, r.payload.length,
            decodeFeature(r.kind, r.payload))
        }
      }
    }
  }

  /** Frames sampled per video payload for the pooled feature — bounds the
    * decode work per record the way `targetRecordsPerBatch` bounds it per
    * task. */
  val VideoFeatureFrames = 8

  /** The shared per-record feature kernel ([[extractFeatures]], the
    * streaming [[graft.streaming.EventStreams.enrichLatestMediaFeatures]]):
    * real codec by kind, byte-math stub when no JDK codec claims the
    * payload. Always 16 dims.
    *
    * VIDEO is real when the JDK decodes the container (animated GIF):
    * evenly-strided frames ([[ImageCodec.decodeFrames]], the same kernel
    * [[sampleVideoFrames]] uses) each produce a 4×4 grid-luminance raster
    * feature, mean-pooled across frames — temporal average pooling, the
    * standard fixed-length video descriptor shape. Single-frame stills
    * sent as kind="video" degrade gracefully to that frame's features. */
  def decodeFeature(kind: String, payload: Array[Byte]): Array[Float] = {
    val real = kind match {
      case "image" => ImageCodec.decode(payload).map(ImageCodec.gridLuminance(_, 4))
      case "audio" => AudioCodec.decodeSamples(payload).map(AudioCodec.rmsEnvelope(_))
      case "video" =>
        val frames = ImageCodec.decodeFrames(payload, VideoFeatureFrames)
        if (frames.isEmpty) None
        else {
          val pooled = new Array[Float](StubDecoder.FeatureDim)
          frames.foreach { case (_, img) =>
            val g = ImageCodec.gridLuminance(img, 4)
            var k = 0
            while (k < pooled.length) { pooled(k) += g(k); k += 1 }
          }
          var k = 0
          while (k < pooled.length) { pooled(k) /= frames.size; k += 1 }
          Some(pooled)
        }
      case _ => None
    }
    real.getOrElse(StubDecoder.decodeFeatures(payload))
  }

  /** Build a media frame from any table with a binary-able column (used by
    * tests over the documents table: text bytes stand in for payloads). */
  def fromBinaryColumn(df: DataFrame, idCol: String, payloadCol: String,
                       kind: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), lit(kind).as("kind"),
        col(payloadCol).cast("binary").as("payload"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"))
      .as[MediaRecord]
  }

  /** 64-bit perceptual average-hash (aHash) of an image payload: decode,
    * 8×8 grid mean-luminance ([[ImageCodec.gridLuminance]] — resolution-
    * independent, so a resized copy hashes near-identically), bit i set
    * iff cell i's luminance exceeds the grid mean. Undecodable payloads
    * take a deterministic polynomial byte hash instead (totality under
    * junk payloads, same contract as the byte-math feature stub): two
    * byte-identical junk payloads still pair at distance 0, and unrelated
    * junk lands far apart with overwhelming probability. */
  def imageAHash(payload: Array[Byte]): Long =
    ImageCodec.decode(payload) match {
      case Some(img) =>
        val g = ImageCodec.gridLuminance(img, 8)
        var mean = 0.0
        var i = 0
        while (i < 64) { mean += g(i); i += 1 }
        mean /= 64.0
        var h = 0L
        i = 0
        while (i < 64) { if (g(i) > mean) h |= (1L << i); i += 1 }
        h
      case None =>
        var h = 1125899906842597L // large prime seed
        var i = 0
        while (i < payload.length) { h = h * 31L + (payload(i) & 0xff); i += 1 }
        h
    }

  /** Per-record aHash frame (media_id, sig) for an image dataset — the
    * signature store a perceptual-dedup pipeline persists. Narrow
    * deserialize-once map, no shuffle. */
  def imageAHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.map(r => (r.media_id, imageAHash(r.payload))).toDF("id", "sig")
  }

  /** Perceptual image near-duplicates: pairs of images whose 64-bit aHash
    * differs in ≤ `maxHamming` bits — the image leg of corpus dedup
    * (re-encoded/resized/slightly-edited copies that byte-exact dedup
    * misses). Delegates to the shared pigeonhole-blocked Hamming core
    * ([[graft.ops.Dedup.hammingNearPairs]]): exact for the bound, the
    * quadratic term confined to chunk buckets, degenerate buckets capped.
    * Output (id_a, id_b, hamming). */
  def imageNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 3,
                        maxBucketSize: Int = 1000): DataFrame =
    graft.ops.Dedup.hammingNearPairs(imageAHashes(media), maxHamming,
      maxBucketSize, nBits = 64)
}
