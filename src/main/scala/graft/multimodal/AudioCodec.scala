package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Real audio decode over `javax.sound.sampled` (JDK built-in — WAV/AIFF/AU
  * containers, PCM encodings; no external dependencies). Same contract as
  * [[ImageCodec]]: per-record kernels, one decoded buffer at a time,
  * deterministic; payloads no JDK reader claims (MP3, AAC, truncated
  * headers) return None and callers fall back to
  * [[Multimodal.StubDecoder]], keeping the pipeline total.
  *
  * Reference analogue: none — audio is builder-brief multimodal surface.
  */
object AudioCodec {

  final case class AudioMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                             nFrames: Long)

  /** Header-only metadata probe — `AudioSystem.getAudioFileFormat` parses
    * just the container header (fmt/data chunk sizes for WAV), not the
    * sample data; the cheap audit pass, like [[ImageCodec.probeDims]]. */
  def probeMeta(payload: Array[Byte]): Option[AudioMeta] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
      val f = ff.getFormat
      Some(AudioMeta(f.getSampleRate.toInt, f.getChannels,
        f.getSampleSizeInBits, ff.getFrameLength.toLong))
    } catch { case _: Exception => None }
  }

  /** Decode to mono double samples in [-1, 1] (channel-averaged). Only PCM
    * encodings decode; None otherwise. `maxFrames` bounds the buffer the
    * way a batch-size cap does — one record never allocates unbounded. */
  def decodeSamples(payload: Array[Byte], maxFrames: Int = 1 << 20): Option[Array[Double]] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        if (enc != AudioFormat.Encoding.PCM_SIGNED && enc != AudioFormat.Encoding.PCM_UNSIGNED)
          return None
        val bytesPerSample = f.getSampleSizeInBits / 8
        if (bytesPerSample < 1 || bytesPerSample > 2) return None
        val nFrames = math.min(in.getFrameLength, maxFrames.toLong).toInt
        if (nFrames <= 0) return None
        val frameSize = f.getFrameSize
        val buf = new Array[Byte](nFrames * frameSize)
        var off = 0
        var read = 0
        while (off < buf.length && read >= 0) {
          read = in.read(buf, off, buf.length - off)
          if (read > 0) off += read
        }
        val frames = off / frameSize
        val ch = f.getChannels
        val out = new Array[Double](frames)
        var i = 0
        while (i < frames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            acc += pcmToDouble(buf, i * frameSize + c * bytesPerSample,
              bytesPerSample, f.isBigEndian,
              enc == AudioFormat.Encoding.PCM_UNSIGNED)
            c += 1
          }
          out(i) = acc / ch
          i += 1
        }
        Some(out)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** One PCM sample → [-1, 1]. Unsigned encodings re-center at mid-scale
    * before dividing (8-bit 0x80 → 0.0, 16-bit 0x8000 → 0.0) — assembling
    * the 16-bit value with a sign-extended high byte would decode unsigned
    * mid-scale as -1.0. */
  private[multimodal] def pcmToDouble(buf: Array[Byte], base: Int,
                                      bytesPerSample: Int, bigEndian: Boolean,
                                      unsigned: Boolean): Double =
    if (bytesPerSample == 1) {
      if (unsigned) ((buf(base) & 0xff) - 128) / 128.0
      else buf(base) / 128.0
    } else {
      val lo = buf(base + (if (bigEndian) 1 else 0)) & 0xff
      val hi = buf(base + (if (bigEndian) 0 else 1))
      if (unsigned) ((((hi & 0xff) << 8) | lo) - 32768) / 32768.0
      else ((hi << 8) | lo) / 32768.0
    }

  /** 16-dim RMS-energy envelope: samples cut into
    * [[Multimodal.StubDecoder.FeatureDim]] equal windows, each contributing
    * its root-mean-square amplitude — the audio analogue of
    * [[ImageCodec.gridLuminance]], schema-compatible with the stub. */
  def rmsEnvelope(samples: Array[Double],
                  dim: Int = Multimodal.StubDecoder.FeatureDim): Array[Float] = {
    require(dim > 0, "dim must be positive")
    val n = samples.length
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < n) {
      val w = math.min(dim - 1, (i.toLong * dim / n).toInt)
      sums(w) += samples(i) * samples(i)
      counts(w) += 1
      i += 1
    }
    Array.tabulate(dim)(w =>
      if (counts(w) == 0) 0.0f else math.sqrt(sums(w) / counts(w)).toFloat)
  }
}
