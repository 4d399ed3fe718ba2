package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image decode/resize/feature kernels over `javax.imageio` (JDK
  * built-in — PNG/JPEG/GIF/BMP, zero external dependencies). These are the
  * per-record kernels [[Multimodal]]'s partition-local batch operators
  * call; everything here is driver-free, allocation-bounded by one decoded
  * raster at a time, and deterministic (fixed codec, fixed interpolation,
  * PNG re-encode carries no timestamps).
  *
  * Undecodable payloads (truncated files, non-image kinds, codecs outside
  * the JDK set — notably video/audio) return None and the caller falls
  * back to [[Multimodal.StubDecoder]]'s byte-math, which keeps the
  * pipeline total and loudly documented rather than throwing mid-job.
  *
  * Reference analogue: none — the reference engine is text/ratings-only
  * (see SURVEY.md §2); this is the builder-brief multimodal surface.
  */
object ImageCodec {

  /** Header-only dimension probe: reads just enough of the stream for the
    * codec's SOF/IHDR header — NOT the pixel data. At 100 TB this is the
    * difference between a metadata pass that reads ~KB per record and one
    * that decompresses every raster; use it for audit/stats passes that
    * only need dims. */
  def probeDims(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload == null || payload.isEmpty) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } catch {
      case _: Exception => None
    } finally if (iis != null) iis.close()
  }

  /** Full decode to a raster; None when no JDK codec claims the bytes. */
  def decode(payload: Array[Byte]): Option[BufferedImage] = {
    if (payload == null || payload.isEmpty) return None
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }
  }

  /** Bilinear raster resize, re-encoded as PNG (lossless, deterministic —
    * the PNG chunk stream is a pure function of the raster). */
  def resizePng(img: BufferedImage, targetW: Int, targetH: Int): Array[Byte] = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    encodePng(out)
  }

  /** Deterministic PNG encode of a raster (shared by [[resizePng]] and the
    * real frame-sampling path). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Evenly-strided REAL frame decode from a multi-frame container —
    * animated GIF is the one video-ish format the JDK decodes natively
    * (a production cluster swaps this kernel for an ffmpeg/JNI decoder;
    * every operator above it is decoder-agnostic). Returns at most
    * `maxFrames` (source-index, raster) pairs, evenly spaced across the
    * container's frames; empty when no JDK codec claims the bytes.
    *
    * Frame rasters are the codec's per-frame output: a GIF frame may be a
    * sub-rectangle of the logical screen (inter-frame delta) — fine for
    * per-frame features, which normalize by the raster's own dims. The
    * frame count scan and each read stay bounded by the one in-memory
    * payload; nothing here touches the driver. */
  def decodeFrames(payload: Array[Byte], maxFrames: Int): Seq[(Int, BufferedImage)] = {
    if (payload == null || payload.isEmpty || maxFrames <= 0) return Seq.empty
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) Seq.empty
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          val indices =
            if (n <= maxFrames) 0 until n
            else (0 until maxFrames).map(i => i * n / maxFrames)
          indices.map(i => i -> r.read(i))
        } finally r.dispose()
      }
    } catch {
      case _: Exception => Seq.empty
    } finally if (iis != null) iis.close()
  }

  /** Grid mean-luminance descriptor: the raster is cut into grid×grid
    * cells and each cell contributes its mean ITU-R 601 luma in [0, 1] —
    * a classic tiny-image feature (row-major cell order). grid=4 yields
    * [[Multimodal.StubDecoder.FeatureDim]] = 16 dims, so real and stub
    * features are schema-compatible. */
  def gridLuminance(img: BufferedImage, grid: Int = 4): Array[Float] = {
    require(grid > 0, "grid must be positive")
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val cy = math.min(grid - 1, y * grid / h)
      var x = 0
      while (x < w) {
        val cx = math.min(grid - 1, x * grid / w)
        val rgb = img.getRGB(x, y)
        val lum = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
        val c = cy * grid + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid)(c =>
      if (counts(c) == 0) 0.0f else (sums(c) / counts(c)).toFloat)
  }
}
