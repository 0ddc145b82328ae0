package graft.functions

/** Minimal but REAL RIFF/WAVE PCM16 mono codec — the audio analog of
  * [[Ppm]]: canonical 44-byte header (RIFF size, fmt chunk with
  * PCM tag/mono/sample-rate/byte-rate/block-align/16-bit, data chunk
  * size) plus little-endian 16-bit samples. Strict on decode: every
  * header field that could silently mis-frame the samples is
  * validated. A production pipeline swaps this for libsndfile behind
  * the same bytes→samples→bytes boundary.
  */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
  }
  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  def encode(a: Audio): Array[Byte] = {
    val dataBytes = a.samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    le32(out, 4, 36 + dataBytes)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    le32(out, 16, 16) // fmt chunk size
    le16(out, 20, 1) // PCM
    le16(out, 22, 1) // mono
    le32(out, 24, a.sampleRate)
    le32(out, 28, a.sampleRate * 2) // byte rate
    le16(out, 32, 2) // block align
    le16(out, 34, 16) // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    le32(out, 40, dataBytes)
    var i = 0
    while (i < a.samples.length) { le16(out, 44 + i * 2, a.samples(i) & 0xFFFF); i += 1 }
    out
  }

  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44, s"WAV truncated: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE stream")
    require(tag(bytes, 12) == "fmt " && rd32(bytes, 16) == 16,
      "unsupported fmt chunk")
    require(rd16(bytes, 20) == 1 && rd16(bytes, 22) == 1 && rd16(bytes, 34) == 16,
      "only PCM16 mono supported")
    val rate = rd32(bytes, 24)
    require(rd32(bytes, 28) == rate * 2 && rd16(bytes, 32) == 2,
      "inconsistent byte-rate/block-align")
    require(tag(bytes, 36) == "data", "missing data chunk")
    val dataBytes = rd32(bytes, 40)
    require(dataBytes >= 0 && 44 + dataBytes <= bytes.length,
      s"data chunk claims $dataBytes bytes, have ${bytes.length - 44}")
    val n = dataBytes / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = rd16(bytes, 44 + i * 2).toShort; i += 1 }
    Audio(rate, samples)
  }

  /** Root-mean-square amplitude, normalized to [0, 1]. */
  def rms(a: Audio): Double = {
    if (a.samples.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i) / 32768.0; acc += s * s; i += 1
    }
    math.sqrt(acc / a.samples.length)
  }

  /** Sign-change count — the classic cheap voiced/unvoiced proxy. */
  def zeroCrossings(a: Audio): Long = {
    var n = 0L
    var i = 1
    while (i < a.samples.length) {
      if ((a.samples(i) >= 0) != (a.samples(i - 1) >= 0)) n += 1
      i += 1
    }
    n
  }
}
