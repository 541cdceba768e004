package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** REAL pure-JVM media codecs for the multimodal pipeline — no external
  * libraries: binary PPM (P6) images and RIFF/WAV PCM16 audio are simple
  * enough to decode from scratch, which removes the stub from the image and
  * audio paths (video keeps the clearly-marked stub: there is genuinely no
  * ffmpeg-class decoder in this environment).
  *
  * Formats are public, trivial specs:
  *   PPM P6: "P6\n<width> <height>\n<maxval>\n" + raw RGB triplets.
  *   WAV:    RIFF header + "fmt " chunk (PCM, 16-bit LE) + "data" chunk.
  */
object Codecs {

  // ------------------------------------------------------------------ PPM

  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Encode an RGB image as binary PPM (P6, maxval 255). */
  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Decode binary PPM; None on anything malformed (wrong magic, short
    * payload, absurd dims) — corrupt media must degrade, not throw. */
  def decodePpm(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 9 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipSpace(): Unit = {
      while (pos < bytes.length &&
        (bytes(pos) == ' ' || bytes(pos) == '\n' || bytes(pos) == '\r' || bytes(pos) == '\t')) pos += 1
      // '#' comments permitted by the spec
      if (pos < bytes.length && bytes(pos) == '#') {
        while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        skipSpace()
      }
    }
    def readInt(): Option[Int] = {
      skipSpace()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
      if (pos == start || pos - start > 9) None
      else Some(new String(bytes, start, pos - start, StandardCharsets.US_ASCII).toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxv <- readInt()
      if w > 0 && h > 0 && w <= 65536 && h <= 65536 && maxv == 255
      _ = { pos += 1 } // single whitespace after maxval
      if bytes.length - pos >= w.toLong * h * 3
    } yield Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
  }

  /** Box-filter resize to (outW, outH) — a REAL downsample, averaging the
    * source pixels each output pixel covers. */
  def resize(img: Image, outW: Int, outH: Int): Image = {
    val out = new Array[Byte](outW * outH * 3)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * img.height / outH
      val y1 = math.max(y0 + 1, (oy + 1) * img.height / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * img.width / outW
        val x1 = math.max(x0 + 1, (ox + 1) * img.width / outW)
        var c = 0
        while (c < 3) {
          var sum = 0L; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              sum += img.rgb((y * img.width + x) * 3 + c) & 0xFF
              n += 1; x += 1
            }
            y += 1
          }
          out((oy * outW + ox) * 3 + c) = (sum / n).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    Image(outW, outH, out)
  }

  /** Image feature vector: [meanR, meanG, meanB, 8-bin luminance histogram
    * (normalized), aspect ratio, log10(pixels)] padded/truncated to dims. */
  def imageFeatures(img: Image, dims: Int): Array[Float] = {
    val n = img.width * img.height
    val sums = new Array[Long](3)
    val hist = new Array[Long](8)
    var i = 0
    while (i < n) {
      val r = img.rgb(i * 3) & 0xFF; val g = img.rgb(i * 3 + 1) & 0xFF; val b = img.rgb(i * 3 + 2) & 0xFF
      sums(0) += r; sums(1) += g; sums(2) += b
      val lum = (r * 299 + g * 587 + b * 114) / 1000
      hist(math.min(lum >> 5, 7)) += 1
      i += 1
    }
    val f = Array.fill(dims)(0.0f)
    (0 until math.min(3, dims)).foreach(c => f(c) = sums(c).toFloat / n / 255.0f)
    (0 until 8).foreach(b => if (3 + b < dims) f(3 + b) = hist(b).toFloat / n)
    if (11 < dims) f(11) = img.width.toFloat / img.height
    if (12 < dims) f(12) = math.log10(n.toDouble).toFloat
    f
  }

  // ------------------------------------------------------------------ WAV

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode PCM16 mono as RIFF/WAV. */
  def encodeWav(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(1) // PCM, mono
    buf.putInt(a.sampleRate); buf.putInt(a.sampleRate * 2)
    buf.putShort(2); buf.putShort(16) // block align, bits
    buf.put("data".getBytes); buf.putInt(dataLen)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode RIFF/WAV PCM16 mono; None on malformed input. */
  def decodeWav(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int) = new String(bytes, at, 4, StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE" || tag(12) != "fmt ") return None
    val fmtLen = buf.getInt(16)
    if (buf.getShort(20) != 1 || buf.getShort(22) != 1 || buf.getShort(34) != 16) return None
    val rate = buf.getInt(24)
    val dataAt = 20 + fmtLen
    if (dataAt + 8 > bytes.length || tag(dataAt) != "data") return None
    val dataLen = math.min(buf.getInt(dataAt + 4), bytes.length - dataAt - 8)
    if (rate <= 0 || dataLen < 0) return None
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = buf.getShort(dataAt + 8 + i * 2); i += 1 }
    Some(Audio(rate, samples))
  }

  /** Audio feature vector: [RMS (normalized), zero-crossing rate, mean
    * |amplitude|, log10(duration ms)] padded to dims. */
  def audioFeatures(a: Audio, dims: Int): Array[Float] = {
    val n = math.max(a.samples.length, 1)
    var sq = 0.0; var absSum = 0.0; var zc = 0
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i).toDouble
      sq += s * s; absSum += math.abs(s)
      if (i > 0 && ((a.samples(i - 1) < 0) != (a.samples(i) < 0))) zc += 1
      i += 1
    }
    val f = Array.fill(dims)(0.0f)
    if (dims > 0) f(0) = (math.sqrt(sq / n) / 32768.0).toFloat
    if (dims > 1) f(1) = zc.toFloat / n
    if (dims > 2) f(2) = (absSum / n / 32768.0).toFloat
    if (dims > 3) f(3) = math.log10(math.max(a.samples.length * 1000.0 / math.max(a.sampleRate, 1), 1.0)).toFloat
    f
  }
}
