package graft.functions

import java.nio.ByteBuffer

/** Minimal real codecs for the multimodal operators — pure JVM, no
  * external libraries (the container ships none), but REAL formats
  * with headers, dimensions and pixel payloads, so decode/resize/
  * frame-sample are actual parsing + resampling, not fakes:
  *
  *  - Images: binary PPM (P6) — `"P6\n<w> <h>\n255\n"` + w·h·3 raw
  *    RGB bytes. Any image viewer opens these.
  *  - Video: a length-prefixed frame sequence `"GSEQ"` + int32 frame
  *    count + per-frame (int32 length, PPM bytes) — the moral
  *    equivalent of an MJPEG container.
  *
  * The real-codec boundary a production pipeline swaps in (libjpeg /
  * ffmpeg via JNI or a Pandas UDF) has exactly this signature:
  * bytes → (dims, pixels) → bytes.
  */
object Ppm {

  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM payload")
    // header = three whitespace-separated tokens after the magic
    var i = 2
    def token(): Int = {
      while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
      var v = 0
      while (i < bytes.length && !bytes(i).toChar.isWhitespace) {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = token(); val h = token(); val maxVal = token()
    require(maxVal == 255, s"unsupported maxval $maxVal")
    i += 1 // single whitespace after maxval per spec
    // fail loudly on corrupt payloads: copyOfRange would silently
    // zero-pad a truncated pixel section, and unchecked header dims
    // are an allocation bomb — this is the boundary where a real
    // codec swap-in must surface corruption too
    require(w > 0 && h > 0 && w.toLong * h * 3 <= bytes.length - i,
      s"corrupt P6: ${w}x$h needs ${w.toLong * h * 3} pixel bytes, " +
        s"payload has ${bytes.length - i}")
    val pixels = java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)
    Image(w, h, pixels)
  }

  /** Nearest-neighbor resample — the classic O(W·H) resize. */
  def resize(img: Image, newW: Int, newH: Int): Image = {
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * img.height / newH
      var x = 0
      while (x < newW) {
        val sx = x * img.width / newW
        val src = (sy * img.width + sx) * 3
        val dst = (y * newW + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    Image(newW, newH, out)
  }

  /** Mean pixel intensity (0..255) over all channels, rounded to 4
    * decimals — deterministic "feature extraction" over real pixels. */
  def meanIntensity(img: Image): Double = {
    if (img.pixels.isEmpty) return 0.0
    var sum = 0L
    var i = 0
    while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
    math.rint(sum.toDouble / img.pixels.length * 10000) / 10000
  }

  // ---- GSEQ frame-sequence container ------------------------------

  private val Magic = Array[Byte]('G', 'S', 'E', 'Q')

  def encodeSeq(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.put(Magic).putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length).put(f) }
    buf.array()
  }

  def decodeSeq(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, Magic), "not a GSEQ payload")
    val n = buf.getInt()
    (0 until n).map { _ =>
      val len = buf.getInt()
      val f = new Array[Byte](len)
      buf.get(f)
      f
    }
  }
}
