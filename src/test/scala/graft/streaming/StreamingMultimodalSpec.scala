package graft.streaming

import graft.SparkTestBase
import graft.multimodal.{ImageCodec, Multimodal}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingMultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000)

  test("streaming tumbling counts match the batch query semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingCounts(df, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    input.addData((ts(0), "click", 1.0), (ts(60), "click", 2.0), (ts(3700), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("tumbling_test")
      .select(col("window.start").cast("string"), col("event_type"), col("cnt"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 00:00:00", "click", 2L, 3.0),
      ("2024-01-01 01:00:00", "view", 1L, 5.0)))
  }

  test("streaming sessionize assigns session ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "event_id", "ts")
    val q = EventStreams.sessionize(df, gapSeconds = 1800)
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    input.addData((1L, 1L, ts(0)), (1L, 2L, ts(100)))
    q.processAllAvailable()
    input.addData((1L, 3L, ts(5000)), (2L, 4L, ts(0)))
    q.processAllAvailable()
    val rows = spark.table("session_test").as[EventStreams.SessionizedEvent]
      .collect().map(e => e.event_id -> e.session_id).toMap
    q.stop()
    assert(rows == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("sessionize evicts idle-user state past the horizon and restarts fresh") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("user_id", "event_id", "ts")
    val q = EventStreams.sessionize(df, gapSeconds = 10, horizonSeconds = 60)
      .writeStream.format("memory").queryName("session_evict_test")
      .outputMode("append").start()
    // two users start sessions, then fall silent
    input.addData((1L, 1L, ts(0)), (1L, 2L, ts(5)), (2L, 3L, ts(0)))
    q.processAllAvailable()
    // a third user far past the horizon advances the watermark...
    input.addData((3L, 4L, ts(1000)))
    q.processAllAvailable()
    // ...and the next batch fires the event-time timeouts for users 1 and 2
    input.addData((3L, 5L, ts(1100)))
    q.processAllAvailable()
    // user 1 returns after eviction: FRESH state, session id restarts at 0
    // (a stale surviving state would emit 1 via the gap increment)
    input.addData((1L, 6L, ts(1200)))
    q.processAllAvailable()
    val rows = spark.table("session_evict_test").as[EventStreams.SessionizedEvent]
      .collect().map(e => e.event_id -> e.session_id).toMap
    // the state store holds only users seen within the horizon (3 and the
    // returned 1), not every user ever — bounded under an idle-user feed
    val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
    q.stop()
    assert(rows(1L) == 0L && rows(2L) == 0L && rows(3L) == 0L)
    assert(rows(4L) == 0L && rows(5L) == 1L) // user 3: 100s gap > 10s -> new session
    assert(rows(6L) == 0L, s"returned user must restart fresh: ${rows(6L)}")
    assert(stateRows <= 2, s"state store must evict idle users: $stateRows rows")
  }

  test("multimodal feature extraction is deterministic with stable schema") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "different"))
      .toDF("doc_id", "text")
    val media = Multimodal.fromBinaryColumn(docs, "doc_id", "text", "image")
    val feats = Multimodal.extractFeatures(media, targetRecordsPerBatch = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).feature.toSeq == feats(2L).feature.toSeq)
    assert(feats(1L).feature.toSeq != feats(3L).feature.toSeq)
    assert(feats(1L).n_bytes == "hello world".getBytes.length)
    assert(feats(1L).feature.length == Multimodal.StubDecoder.FeatureDim)
  }

  test("resize stub bounds payload to target area and updates metadata") {
    val docs = Seq((1L, "x" * 1000), (2L, "short")).toDF("doc_id", "text")
    val media = Multimodal.fromBinaryColumn(docs, "doc_id", "text", "image")
    val resized = Multimodal.resizeAll(media, targetW = 8, targetH = 8)
      .collect().map(r => r.media_id -> r).toMap
    assert(resized(1L).payload.length == 64)
    assert(resized(1L).width == 8 && resized(1L).height == 8)
    assert(resized(2L).payload.length == "short".length) // never upsamples
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeAll(media, 8, 8).collect()
      .find(_.media_id == 1L).get
    assert(again.payload.sameElements(resized(1L).payload))
  }

  // a real PNG, built in memory: left half black, right half white
  private def halfToneImage(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    img
  }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode: header probe, pixel-true resize, luminance features") {
    val payload = pngBytes(halfToneImage(32, 20))
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", payload, 0, 0, 0),
      Multimodal.MediaRecord(2L, "image", "not an image".getBytes, 0, 0, 0))
      .toDS()
    // header-only probe fills real dims; the undecodable record keeps its own
    val probed = Multimodal.probeImageMeta(media).collect().map(r => r.media_id -> r).toMap
    assert(probed(1L).width == 32 && probed(1L).height == 20)
    assert(probed(2L).width == 0 && probed(2L).height == 0)
    // real raster resize: the output payload is a decodable 8x8 PNG whose
    // pixels preserve the half-black/half-white layout
    val resized = Multimodal.resizeAll(media, 8, 8).collect().map(r => r.media_id -> r).toMap
    assert(resized(1L).width == 8 && resized(1L).height == 8)
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(1L).payload))
    assert(out.getWidth == 8 && out.getHeight == 8)
    assert((out.getRGB(0, 4) & 0xffffff) == 0x000000) // left edge stays black
    assert((out.getRGB(7, 4) & 0xffffff) == 0xffffff) // right edge stays white
    // deterministic re-encode
    val again = Multimodal.resizeAll(media, 8, 8).collect().find(_.media_id == 1L).get
    assert(again.payload.sameElements(resized(1L).payload))
    // pixel features: 4x4 grid luminance — left grid columns ~0, right ~1,
    // a shape the byte-math stub cannot produce from compressed PNG bytes
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    val f1 = feats(1L).feature
    assert(f1.length == Multimodal.StubDecoder.FeatureDim)
    for (row <- 0 until 4) {
      assert(f1(row * 4) < 0.05, s"left cell row $row should be black: ${f1(row * 4)}")
      assert(f1(row * 4 + 3) > 0.95, s"right cell row $row should be white: ${f1(row * 4 + 3)}")
    }
    // the undecodable "image" falls back to the stub — same schema
    assert(feats(2L).feature.length == Multimodal.StubDecoder.FeatureDim)
  }

  // a real WAV, built in memory: 16-bit PCM mono, silence then a loud
  // square wave — the RMS envelope must be ~0 in early windows, high late
  private def wavBytes(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- nSamples / 2 until nSamples) { // loud second half
      val v: Short = if ((i / 20) % 2 == 0) 16384 else -16384
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: header probe, RMS-envelope features, stub fallback") {
    val wav = wavBytes(8000, 3200)
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", wav, 0, 0, 0),
      Multimodal.MediaRecord(2L, "audio", "not audio".getBytes, 0, 0, 0))
      .toDS()
    // header-only probe fills the real sample rate
    val probed = Multimodal.probeImageMeta(media).collect().map(r => r.media_id -> r).toMap
    assert(probed(1L).sample_rate == 8000)
    assert(probed(2L).sample_rate == 0)
    // real PCM features: silent first half -> ~0 RMS, square-wave second
    // half -> ~0.5 RMS, a shape byte-math over the WAV container can't make
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    val f1 = feats(1L).feature
    assert(f1.length == Multimodal.StubDecoder.FeatureDim)
    for (w <- 0 until 8) assert(f1(w) < 0.01, s"window $w should be silent: ${f1(w)}")
    for (w <- 8 until 16) assert(f1(w) > 0.4, s"window $w should be loud: ${f1(w)}")
    // undecodable audio falls back to the stub — same schema
    assert(feats(2L).feature.length == Multimodal.StubDecoder.FeatureDim)
    assert(feats(2L).feature.toSeq ==
      Multimodal.StubDecoder.decodeFeatures("not audio".getBytes).toSeq)
  }

  test("raster within the target box passes through with pixel-true dims") {
    val payload = pngBytes(halfToneImage(6, 5))
    val media = Seq(Multimodal.MediaRecord(1L, "image", payload, 0, 0, 0)).toDS()
    val r = Multimodal.resizeAll(media, 8, 8).collect().head
    assert(r.payload.sameElements(payload)) // no upsample, no re-encode
    assert(r.width == 6 && r.height == 5)   // but dims become pixel-true
  }

  test("streaming media enrichment equals the batch as-of join on an in-order feed") {
    implicit val sqlCtx = spark.sqlContext
    val png1 = pngBytes(halfToneImage(16, 16))
    val png2 = pngBytes(halfToneImage(24, 8))
    val textPayload = "not an image".getBytes
    // media uploads: media 1 at t0 (png1) and re-upload at t200 (png2);
    // media 2 at t50 (undecodable -> stub features)
    val mediaIn = MemoryStream[(Long, String, Array[Byte], Long, java.sql.Timestamp)]
    val viewsIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val media = mediaIn.toDF().toDF("media_id", "kind", "payload", "event_id", "ts")
    val views = viewsIn.toDF().toDF("media_id", "event_id", "ts")
    val q = EventStreams.enrichLatestMediaFeatures(views, media)
      .writeStream.format("memory").queryName("media_enrich_test")
      .outputMode("append").start()
    // in-order feed across micro-batches
    mediaIn.addData((1L, "image", png1, 10L, ts(0)), (2L, "image", textPayload, 11L, ts(50)))
    viewsIn.addData((1L, 100L, ts(60)), (2L, 101L, ts(60)), (3L, 102L, ts(60)))
    q.processAllAvailable()
    mediaIn.addData((1L, "image", png2, 12L, ts(200)))
    viewsIn.addData((1L, 103L, ts(300)))
    q.processAllAvailable()
    val got = spark.table("media_enrich_test")
      .as[EventStreams.MediaEnrichedView].collect()
      .map(v => v.event_id -> v).toMap
    q.stop()
    // batch twin: extractFeatures on the media corpus, as-of join by media_id
    val mediaBatch = Seq(
      Multimodal.MediaRecord(1L, "image", png1, 0, 0, 0),
      Multimodal.MediaRecord(2L, "image", textPayload, 0, 0, 0),
      Multimodal.MediaRecord(1L, "image", png2, 0, 0, 0))
    val batchFeats = Multimodal.extractFeatures(mediaBatch.toDS()).collect()
    def featOf(payload: Array[Byte]): Seq[Float] =
      Multimodal.extractFeatures(
        Seq(Multimodal.MediaRecord(0L, "image", payload, 0, 0, 0)).toDS())
        .collect().head.feature.toSeq
    assert(got.size == 4)
    assert(got(100L).media_event_id == 10L && got(100L).feature.toSeq == featOf(png1))
    assert(got(101L).media_event_id == 11L && got(101L).feature.toSeq == featOf(textPayload))
    assert(got(102L).media_event_id == null && got(102L).feature == null) // media never arrived
    assert(got(103L).media_event_id == 12L && got(103L).feature.toSeq == featOf(png2))
    // and the batch as-of join picks the same media row per view
    val featDf = mediaBatch.zip(Seq(10L, 11L, 12L)).zip(Seq(ts(0), ts(50), ts(200)))
      .map { case ((m, eid), t) => (m.media_id, eid, t) }
      .toDF("media_id", "event_id", "ts")
    val viewDf = Seq((1L, 100L, ts(60)), (2L, 101L, ts(60)), (3L, 102L, ts(60)),
      (1L, 103L, ts(300))).toDF("media_id", "event_id", "ts")
    val asof = graft.ops.TimeJoins.asofJoin(viewDf, featDf, Seq("media_id"),
        "ts", "event_id", Seq.empty)
      .select(col("event_id"), col("r_id")).as[(Long, Option[Long])].collect().toMap
    got.foreach { case (eid, v) =>
      assert(asof(eid) == Option(v.media_event_id).map(_.toLong), s"view $eid")
    }
  }

  test("video frame sampling as a dataset operator bounds rows per payload") {
    val docs = Seq((1L, "y" * 1000), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.fromBinaryColumn(docs, "doc_id", "text", "video")
    val frames = Multimodal.sampleVideoFrames(media, frameBytes = 100, maxFrames = 5)
      .collect()
    assert(frames.count(_.media_id == 1L) == 5)
    assert(frames.forall(_.frame.length <= 100))
    assert(!frames.exists(_.media_id == 2L)) // empty payload -> no frames
  }

  test("frame sampling bounds count and window size") {
    val payload = Array.tabulate[Byte](1000)(i => (i % 127).toByte)
    val frames = Multimodal.StubDecoder.sampleFrames(payload, frameBytes = 100, maxFrames = 5)
    assert(frames.length == 5)
    assert(frames.forall(_.length <= 100))
    assert(Multimodal.StubDecoder.sampleFrames(Array.empty[Byte], 100, 5).isEmpty)
  }

  // a real animated GIF, built in memory: frames 0-4 black, 5-9 white
  private def animatedGifBytes(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until nFrames) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = if (f < nFrames / 2) 0x000000 else 0xffffff
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("real video features: frame-decoded, mean-pooled, stable across re-encode") {
    // frames 0-4 black, 5-9 white -> temporal mean pooling over evenly
    // strided frames gives ~0.5 per grid cell, a value byte-math over the
    // LZW-compressed GIF container cannot produce
    val gif = animatedGifBytes(16, 12, nFrames = 10)
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", gif, 0, 0, 0),
      Multimodal.MediaRecord(2L, "video", Array.tabulate[Byte](600)(_.toByte), 0, 0, 0))
      .toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    val f1 = feats(1L).feature
    assert(f1.length == Multimodal.StubDecoder.FeatureDim)
    f1.foreach(v => assert(v > 0.3f && v < 0.7f, s"pooled cell should be ~0.5: ${f1.toSeq}"))
    // pixel-derived, not the stub's byte math over the same payload
    assert(f1.toSeq != Multimodal.StubDecoder.decodeFeatures(gif).toSeq)
    // deterministic across an independent re-encode of the same frames
    assert(Multimodal.decodeFeature("video", animatedGifBytes(16, 12, 10)).toSeq == f1.toSeq)
    // undecodable video still falls back to the stub — same schema
    assert(feats(2L).feature.toSeq ==
      Multimodal.StubDecoder.decodeFeatures(Array.tabulate[Byte](600)(_.toByte)).toSeq)
    // a single-frame still sent as kind=video degrades to that frame's
    // image features (pooling over one frame)
    val png = pngBytes(halfToneImage(16, 12))
    assert(Multimodal.decodeFeature("video", png).toSeq ==
      Multimodal.decodeFeature("image", png).toSeq)
  }

  test("real GIF frame sampling: strided source indices, true pixels per frame") {
    val gif = animatedGifBytes(8, 6, nFrames = 10)
    // the kernel: 4 of 10 frames, evenly strided, rasters decoded
    val decoded = ImageCodec.decodeFrames(gif, maxFrames = 4)
    assert(decoded.map(_._1) == Seq(0, 2, 5, 7))
    // the operator: real frames for the GIF, stub windows for noise bytes
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", gif, 0, 0, 0),
      Multimodal.MediaRecord(2L, "video", Array.tabulate[Byte](500)(_.toByte), 0, 0, 0))
      .toDS()
    val frames = Multimodal.sampleVideoFrames(media, frameBytes = 100, maxFrames = 4)
      .collect()
    val gifFrames = frames.filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(gifFrames.map(_.frame_idx).toSeq == Seq(0, 2, 5, 7))
    // each sampled frame round-trips as a real image with the GIF's dims,
    // and early/late frames carry the dark/bright pixel content
    val lums = gifFrames.map { fr =>
      val img = ImageCodec.decode(fr.frame).get
      assert(img.getWidth == 8 && img.getHeight == 6)
      ImageCodec.gridLuminance(img, 1).head
    }
    assert(lums(0) < 0.1f && lums(1) < 0.1f, s"early frames dark: ${lums.toSeq}")
    assert(lums(2) > 0.9f && lums(3) > 0.9f, s"late frames bright: ${lums.toSeq}")
    // noise payload: stub path, dense indices, bounded windows
    val stubFrames = frames.filter(_.media_id == 2L)
    assert(stubFrames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(stubFrames.forall(_.frame.length <= 100))
  }
}
