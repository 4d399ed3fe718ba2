package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** PCM sample-conversion math, exercised directly — the JDK writers only
  * emit signed 16-bit WAV, so the unsigned-16 branch can't be reached
  * through a container fixture. */
class AudioCodecSpec extends AnyFunSuite {

  private def u16(v: Int, bigEndian: Boolean): Array[Byte] =
    if (bigEndian) Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    else Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  test("unsigned 16-bit decodes mid-scale to 0, extremes to ±1") {
    for (be <- Seq(false, true)) {
      assert(AudioCodec.pcmToDouble(u16(0x8000, be), 0, 2, be, unsigned = true) == 0.0)
      assert(AudioCodec.pcmToDouble(u16(0x0000, be), 0, 2, be, unsigned = true) == -1.0)
      val top = AudioCodec.pcmToDouble(u16(0xffff, be), 0, 2, be, unsigned = true)
      assert(math.abs(top - (32767.0 / 32768.0)) < 1e-12)
      // monotone around mid-scale: one step above mid is one quantum positive
      assert(AudioCodec.pcmToDouble(u16(0x8001, be), 0, 2, be, unsigned = true) == 1.0 / 32768.0)
    }
  }

  test("signed 16-bit decodes zero to 0, min to -1") {
    for (be <- Seq(false, true)) {
      assert(AudioCodec.pcmToDouble(u16(0x0000, be), 0, 2, be, unsigned = false) == 0.0)
      assert(AudioCodec.pcmToDouble(u16(0x8000, be), 0, 2, be, unsigned = false) == -1.0)
      assert(AudioCodec.pcmToDouble(u16(0x7fff, be), 0, 2, be, unsigned = false)
        == 32767.0 / 32768.0)
    }
  }

  test("8-bit unsigned re-centers at 0x80; 8-bit signed divides by 128") {
    assert(AudioCodec.pcmToDouble(Array(0x80.toByte), 0, 1, bigEndian = false, unsigned = true) == 0.0)
    assert(AudioCodec.pcmToDouble(Array(0x00.toByte), 0, 1, bigEndian = false, unsigned = true) == -1.0)
    assert(AudioCodec.pcmToDouble(Array(0x00.toByte), 0, 1, bigEndian = false, unsigned = false) == 0.0)
    assert(AudioCodec.pcmToDouble(Array(0x80.toByte), 0, 1, bigEndian = false, unsigned = false) == -1.0)
  }
}
