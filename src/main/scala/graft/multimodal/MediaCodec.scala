package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs — no native libraries, no JNI, fully
  * deterministic. These are REAL decoders for real container formats
  * (24-bit uncompressed BMP, 16-bit PCM WAV), not stubs: a payload
  * produced by any standard tool in these formats decodes here, and the
  * encoders produce files any standard viewer opens.
  *
  * Video uses a minimal explicit container (`GFV1`: magic, frame count,
  * frame lengths, concatenated BMP frames) because no codec-free video
  * format exists; each FRAME is a real BMP. Swapping in an MP4/H.264
  * decoder changes [[decodeVideoFrames]] only.
  *
  * All multi-byte integers are little-endian, per both formats' specs.
  */
object MediaCodec {

  // ------------------------------------------------------------- BMP

  /** Bytes per BMP pixel row including the 4-byte alignment padding. */
  def bmpRowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Total encoded size of a `width`×`height` 24-bit BMP. */
  def bmpSize(width: Int, height: Int): Int = 54 + bmpRowSize(width) * height

  /** Encode top-down row-major RGB triples (3 bytes/pixel) as a 24-bit
    * uncompressed bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER). */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"encodeBmp: need ${width * height * 3} bytes, got ${rgb.length}")
    val rowSize = bmpRowSize(width)
    val buf = ByteBuffer.allocate(bmpSize(width, height)).order(ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER (14 bytes)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(buf.capacity()).putShort(0).putShort(0).putInt(54)
    // BITMAPINFOHEADER (40 bytes); positive height = bottom-up rows
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(rowSize * height).putInt(2835).putInt(2835)
    buf.putInt(0).putInt(0)
    // pixel array: bottom-up rows, BGR order, rows padded to 4 bytes
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        buf.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i))
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP to (width, height, top-down
    * row-major RGB triples). Rejects other depths/compressions loudly. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "decodeBmp: not a BMP payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0,
      s"decodeBmp: only 24-bit uncompressed supported (bpp=$bpp, comp=$compression)")
    require(width > 0 && height > 0, s"decodeBmp: bad dims ${width}x$height")
    val rowSize = bmpRowSize(width)
    require(bytes.length >= offset + rowSize * height, "decodeBmp: truncated pixel array")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      // row y of the stored (bottom-up) array is output row height-1-y
      val src = offset + y * rowSize
      val dstRow = height - 1 - y
      var x = 0
      while (x < width) {
        val d = (dstRow * width + x) * 3
        rgb(d) = bytes(src + x * 3 + 2)     // R
        rgb(d + 1) = bytes(src + x * 3 + 1) // G
        rgb(d + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    (width, height, rgb)
  }

  /** Nearest-neighbor resize of top-down RGB pixels. */
  def resizeRgb(rgb: Array[Byte], w: Int, h: Int, newW: Int, newH: Int): Array[Byte] = {
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * h / newH
      var x = 0
      while (x < newW) {
        val sx = x * w / newW
        val s = (sy * w + sx) * 3
        val d = (y * newW + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------- WAV

  /** Total encoded size of an n-sample 16-bit mono PCM WAV. */
  def wavSize(nSamples: Int): Int = 44 + 2 * nSamples

  /** Encode 16-bit mono PCM samples as a canonical RIFF/WAVE file. */
  def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                    // PCM
    buf.putShort(1)                    // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)         // byte rate
    buf.putShort(2)                    // block align
    buf.putShort(16)                   // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a 16-bit mono PCM WAV to (sampleRate, samples). Walks the
    * chunk list (so files with extra chunks still decode); rejects
    * non-PCM/stereo/other-depth loudly. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "decodeWav: not a WAV payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = buf.getInt(pos + 4)
      id match {
        case "fmt " =>
          val fmt = buf.getShort(pos + 8)
          val channels = buf.getShort(pos + 10)
          val bits = buf.getShort(pos + 22)
          require(fmt == 1 && channels == 1 && bits == 16,
            s"decodeWav: only 16-bit mono PCM supported (fmt=$fmt ch=$channels bits=$bits)")
          sampleRate = buf.getInt(pos + 12)
        case "data" =>
          val n = len / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort(pos + 8 + 2 * i); i += 1 }
        case _ => () // skip unknown chunks
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && samples != null, "decodeWav: missing fmt/data chunk")
    (sampleRate, samples)
  }

  // ------------------------------------------------------------ JPEG

  /** JPEG via the stock JDK's `javax.imageio` — present in any headless
    * JDK 17, no native libraries (the container-limitation note in
    * earlier round docs was too pessimistic). JPEG is LOSSY: round-trip
    * pixel values are approximate (MultimodalSpec pins MAE bounds), but
    * DIMENSIONS and pixel-array shape are exact — those are what the
    * oracle-checked query (q68) verifies through the real decode path.
    * Encoding pins quality explicitly and writes no metadata, so the
    * byte stream is deterministic for a given JDK (byte SIZES are still
    * encoder-dependent, hence q68 oracles decoded facts, not payload
    * sizes like BMP's q60). */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte],
                 quality: Float = 0.9f): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"encodeJpeg: need ${width * height * 3} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    while (i < width * height) { // raster wants BGR
      data(i * 3) = rgb(i * 3 + 2)
      data(i * 3 + 1) = rgb(i * 3 + 1)
      data(i * 3 + 2) = rgb(i * 3)
      i += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode a JPEG (any baseline/progressive stream ImageIO handles) to
    * (width, height, top-down row-major RGB triples). */
  def decodeJpeg(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isJpeg(bytes), "decodeJpeg: not a JPEG payload")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "decodeJpeg: undecodable JPEG stream")
    val (w, h) = (img.getWidth, img.getHeight)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        val d = (y * w + x) * 3
        rgb(d) = ((px >> 16) & 0xff).toByte
        rgb(d + 1) = ((px >> 8) & 0xff).toByte
        rgb(d + 2) = (px & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** JPEG magic: SOI marker FF D8 followed by a marker byte FF. */
  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte &&
      bytes(2) == 0xff.toByte

  /** Decode either supported image container (BMP or JPEG) to
    * (width, height, top-down RGB). */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) =
    if (isJpeg(bytes)) decodeJpeg(bytes) else decodeBmp(bytes)

  // ------------------------------------------------------------- MP3

  /** MPEG-1 Layer III framing constants (ISO/IEC 11172-3 header
    * layout, public). The synthesis profile is CBR 128 kbps @ 44100 Hz
    * mono, no CRC, no padding: frame length = 144·128000/44100 = 417
    * bytes (4-byte header + 413 carried bytes). The PROBE side parses
    * the real header tables, not just this profile. */
  val Mp3FrameSize = 417
  val Mp3PayloadSize: Int = Mp3FrameSize - 4
  val Mp3SamplesPerFrame = 1152
  val Mp3SampleRate = 44100
  /** MPEG-1 Layer III bitrate table, kbps (index 0 = free, 15 = bad). */
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3SampleRates = Array(44100, 48000, 32000)

  /** Encode `data` as a valid MPEG-1 Layer III frame stream (the bytes
    * ride in the frame payloads; this is a framing fixture, not an
    * audio encoder — any MP3 tool walks these frames and reports
    * 128 kbps / 44.1 kHz / mono / 26.12 ms per frame). Empty input
    * still emits one frame, like the WAV/BMP synthesizers. */
  def encodeMp3(data: Array[Byte]): Array[Byte] = {
    val nFrames = math.max(1, (data.length + Mp3PayloadSize - 1) / Mp3PayloadSize)
    val out = new Array[Byte](nFrames * Mp3FrameSize)
    var f = 0
    while (f < nFrames) {
      val base = f * Mp3FrameSize
      out(base) = 0xFF.toByte     // sync 0xFFE...
      out(base + 1) = 0xFB.toByte // MPEG-1, Layer III, no CRC
      out(base + 2) = 0x90.toByte // bitrate idx 9 (128k), 44100, no pad
      out(base + 3) = 0xC0.toByte // mono
      var i = 0
      while (i < Mp3PayloadSize) {
        val src = f * Mp3PayloadSize + i
        out(base + 4 + i) = if (src < data.length) data(src) else 0
        i += 1
      }
      f += 1
    }
    out
  }

  /** MP3 magic: frame sync (11 set bits) at offset 0. */
  def isMp3(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0

  /** Header-walk metadata probe: parse every frame header (sync,
    * version, layer, bitrate/samplerate table lookups, padding bit),
    * hop frame to frame, and return (n_frames, total_samples,
    * duration_ms) with duration = samples·1000 DIV samplerate in exact
    * integer math. Fails loudly on lost sync, non-MPEG-1-Layer-III
    * frames, reserved table indices, a mid-stream samplerate change,
    * truncation, or trailing garbage — a malformed stream must never
    * yield silently-wrong metadata. */
  def probeMp3(bytes: Array[Byte]): (Int, Long, Long) = {
    var pos = 0
    var frames = 0
    var sampleRate = -1
    while (pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xe0) == 0xe0,
        s"probeMp3: lost frame sync at byte $pos")
      require((bytes(pos + 1) & 0x18) == 0x18, "probeMp3: not MPEG-1")
      require((bytes(pos + 1) & 0x06) == 0x02, "probeMp3: not Layer III")
      val brIdx = (bytes(pos + 2) & 0xf0) >> 4
      val srIdx = (bytes(pos + 2) & 0x0c) >> 2
      require(brIdx >= 1 && brIdx <= 14, s"probeMp3: reserved bitrate index $brIdx")
      require(srIdx <= 2, s"probeMp3: reserved samplerate index $srIdx")
      val sr = Mp3SampleRates(srIdx)
      require(sampleRate == -1 || sr == sampleRate,
        "probeMp3: mid-stream samplerate change")
      sampleRate = sr
      val pad = (bytes(pos + 2) & 0x02) >> 1
      val frameLen = 144 * Mp3Bitrates(brIdx) * 1000 / sr + pad
      require(pos + frameLen <= bytes.length,
        s"probeMp3: truncated frame at byte $pos")
      pos += frameLen
      frames += 1
    }
    require(pos == bytes.length && frames > 0,
      "probeMp3: trailing bytes after last frame (or empty stream)")
    val samples = frames.toLong * Mp3SamplesPerFrame
    (frames, samples, samples * 1000L / sampleRate)
  }

  // ----------------------------------------------------------- video

  private val VideoMagic = "GFV1".getBytes("US-ASCII")

  /** Total encoded size of a GFV1 container holding frames of the given
    * sizes. */
  def videoSize(frameSizes: Seq[Int]): Int = 8 + 4 * frameSizes.length + frameSizes.sum

  /** Pack frames (each an encoded BMP) into the GFV1 container. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val buf = ByteBuffer.allocate(videoSize(frames.map(_.length)))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(VideoMagic).putInt(frames.length)
    frames.foreach(f => buf.putInt(f.length))
    frames.foreach(buf.put)
    buf.array()
  }

  /** Unpack a GFV1 container into its frame payloads. */
  def decodeVideoFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 8 && VideoMagic.indices.forall(i => bytes(i) == VideoMagic(i)),
      "decodeVideoFrames: not a GFV1 payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt(4)
    val lens = (0 until n).map(i => buf.getInt(8 + 4 * i))
    var off = 8 + 4 * n
    lens.map { len =>
      val f = java.util.Arrays.copyOfRange(bytes, off, off + len)
      off += len
      f
    }
  }

  /** Sniff the container format of a payload. */
  def modalityOf(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "image"
    else if (isJpeg(bytes)) "image"
    else if (bytes.length >= 12 && new String(bytes, 0, 4, "US-ASCII") == "RIFF") "audio"
    else if (bytes.length >= 4 && VideoMagic.indices.forall(i => bytes(i) == VideoMagic(i))) "video"
    else "unknown"
}
