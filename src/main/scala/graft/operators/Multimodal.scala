package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by per-partition kernels
  * (the Scala analogue of `mapInPandas` batch UDFs).
  *
  * Image formats have REAL codecs here: 24-bit uncompressed BMP in pure
  * byte math (encodeBmp / decodeBmp — oracle-checked end-to-end by q66)
  * and PNG/JPEG through the pure-JDK ImageIO (encodePng / decodeImage —
  * javax.imageio ships with the JRE, no native libraries; q74
  * oracle-checks the PNG round trip). Audio has a REAL codec too: RIFF/
  * WAVE PCM16 is pure byte math like BMP (encodeWav / decodeWav —
  * oracle-checked end-to-end by q99). RAW video has a real codec as well:
  * YUV4MPEG2 streams in pure byte math (encodeY4m / decodeY4m —
  * oracle-checked end-to-end by q109). COMPRESSED video is covered in all
  * three of its structural layers: intra-frame transform coding
  * (MJPEG-in-AVI below), inter-frame dirty rects (animated GIF89a below),
  * and block-transform + MOTION-COMPENSATED prediction — the H.26x
  * operator class — via the GVC1 codec in [[Video]] (H.264's 4×4 integer
  * core transform, closed-loop ±4 full search, skip modes; q169
  * oracle-checks the bit-lossless q=1 round trip). `fakeDecode` remains a
  * clearly-marked DETERMINISTIC STUB only as the degrade path for FOREIGN
  * bitstreams (conformance-decoding third-party H.264/CABAC files would
  * need a codec library this container doesn't ship) — it derives
  * "metadata" from real bytes of the payload. Everything around the codec
  * boundary (binary schema, typed Dataset kernel, partition-wise batching,
  * feature vectors, frame sampling) is the real Spark plumbing a
  * production decode would use: `decodeAsset` dispatches by media type and
  * nothing else changes.
  */
object Multimodal {

  final case class Asset(id: Long, media_type: String, content: Array[Byte])
  final case class Decoded(
      id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, channels: Int, checksum: Long)

  /** Deterministic synthetic assets derived from the documents table: the
    * text bytes become the opaque payload. */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("id"),
      when(col("id") % 3 === 0, lit("image/png"))
        .when(col("id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("media_type"),
      col("text").cast("binary").as("content"))

  // --------------------------------------------------------------------
  // REAL codec: 24-bit uncompressed BMP (BITMAPFILEHEADER +
  // BITMAPINFOHEADER + bottom-up BGR rows with 4-byte padding) in pure
  // byte math — no image library needed, so the container restriction
  // doesn't force a stub for this format. Compressed formats (PNG/JPEG)
  // still go through the declared stub below.
  // --------------------------------------------------------------------

  private def le32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
    out(off + 2) = ((v >> 16) & 0xff).toByte
    out(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode top-down RGB pixels (row-major, 3 bytes per pixel) as a
    * spec-compliant 24-bit BMP: bottom-up row order, BGR channel order,
    * rows padded to 4-byte multiples. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val rowSize = ((3 * width + 3) / 4) * 4
    val size = 54 + rowSize * height
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, size)
    le32(out, 10, 54) // pixel data offset
    le32(out, 14, 40) // BITMAPINFOHEADER size
    le32(out, 18, width)
    le32(out, 22, height) // positive = bottom-up
    out(26) = 1 // planes
    out(28) = 24 // bits per pixel
    le32(out, 34, rowSize * height)
    le32(out, 38, 2835); le32(out, 42, 2835) // 72 DPI in px/metre
    var r = 0
    while (r < height) {
      val dst = 54 + (height - 1 - r) * rowSize
      var c = 0
      while (c < width) {
        val src = (r * width + c) * 3
        out(dst + c * 3) = rgb(src + 2) // B
        out(dst + c * 3 + 1) = rgb(src + 1) // G
        out(dst + c * 3 + 2) = rgb(src) // R
        c += 1
      }
      r += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP back to (width, height, top-down RGB
    * pixels). Validates magic, bpp and compression fields. */
  def decodeBmp(bmp: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bmp.length >= 54 && bmp(0) == 'B' && bmp(1) == 'M', "not a BMP")
    val offset = rd32(bmp, 10)
    val width = rd32(bmp, 18)
    val height = rd32(bmp, 22)
    require(rd16(bmp, 28) == 24, "only 24-bit BMP supported")
    require(rd32(bmp, 30) == 0, "only uncompressed BMP supported")
    // header fields are untrusted input: bound them BEFORE allocating (a
    // corrupt width of 2^31-1 would otherwise drive a negative/huge alloc)
    require(width > 0 && height > 0 && width <= (1 << 16) && height <= (1 << 16),
      s"implausible BMP dimensions ${width}x$height")
    val rowSize = ((3 * width + 3) / 4) * 4
    require(offset >= 54 && bmp.length.toLong >= offset.toLong + rowSize.toLong * height,
      "BMP truncated: pixel array exceeds payload")
    val rgb = new Array[Byte](width * height * 3)
    var r = 0
    while (r < height) {
      val src = offset + (height - 1 - r) * rowSize
      var c = 0
      while (c < width) {
        val dst = (r * width + c) * 3
        rgb(dst) = bmp(src + c * 3 + 2) // R
        rgb(dst + 1) = bmp(src + c * 3 + 1) // G
        rgb(dst + 2) = bmp(src + c * 3) // B
        c += 1
      }
      r += 1
    }
    (width, height, rgb)
  }

  // --------------------------------------------------------------------
  // REAL codec #2: PNG (and JPEG on the decode side) via the pure-JDK
  // ImageIO — javax.imageio is part of the JRE, so the native-library
  // restriction doesn't apply. PNG is lossless: decoded PIXELS are exact
  // and oracle-able; the ENCODED byte stream is JDK-implementation-defined,
  // so oracle-checked outputs must depend only on decoded pixels (unlike
  // the in-repo BMP codec, where n_bytes is part of the contract).
  // --------------------------------------------------------------------

  /** Encode top-down RGB pixels (row-major, 3 bytes per pixel) as PNG. */
  /** Top-down RGB bytes -> TYPE_INT_RGB BufferedImage (the one shared
    * pixel-packing loop for every ImageIO-backed encoder). */
  def toBufferedImage(width: Int, height: Int, rgb: Array[Byte])
      : java.awt.image.BufferedImage = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < height) {
      var c = 0
      while (c < width) {
        val i = (r * width + c) * 3
        img.setRGB(c, r,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        c += 1
      }
      r += 1
    }
    img
  }

  /** BufferedImage -> (width, height, summed RGB over all pixels) — the
    * shared decoded-pixel walk. */
  def pixelSum(img: java.awt.image.BufferedImage): Long = {
    var sum = 0L
    var r = 0
    while (r < img.getHeight) {
      var c = 0
      while (c < img.getWidth) {
        val px = img.getRGB(c, r)
        sum += ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
        c += 1
      }
      r += 1
    }
    sum
  }

  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(width, height, rgb), "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG, JPEG, ...) to
    * (width, height, top-down RGB). None when the bytes aren't a supported
    * image — the caller degrades to the stub instead of failing. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val rgb = new Array[Byte](w * h * 3)
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val px = img.getRGB(c, r)
          val i = (r * w + c) * 3
          rgb(i) = ((px >> 16) & 0xff).toByte
          rgb(i + 1) = ((px >> 8) & 0xff).toByte
          rgb(i + 2) = (px & 0xff).toByte
          c += 1
        }
        r += 1
      }
      Some((w, h, rgb))
    }
  }

  private def pixelCrc(rgb: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < rgb.length) { crc = (crc * 31 + (rgb(i) & 0xff)) & 0xffffffffL; i += 1 }
    crc
  }

  /** Dispatching decoder: real BMP parse for image/bmp, real ImageIO
    * decode for image/png and image/jpeg (header width/height, channels=3,
    * checksum over DECODED pixels), real RIFF/PCM16 parse for audio/wav
    * (width = frames, height = sample rate, checksum over DECODED
    * samples); the declared stub only for video formats the JDK has no
    * codec for. A payload that CLAIMS to be a decodable type but fails
    * parsing degrades to the stub path instead of killing the job — one
    * corrupt asset must not fail a partition. */
  def decodeAsset(a: Asset): Decoded =
    if (a.media_type == "audio/wav") {
      try {
        val (rate, ch, samples) = decodeWav(a.content)
        Decoded(a.id, a.media_type, a.content.length,
          width = samples.length / ch, height = rate, channels = ch,
          checksum = pcmCrc(samples))
      } catch {
        case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException =>
          fakeDecode(a)
      }
    } else if (a.media_type == "image/bmp") {
      try {
        val (w, h, rgb) = decodeBmp(a.content)
        Decoded(a.id, a.media_type, a.content.length, w, h, 3, pixelCrc(rgb))
      } catch {
        case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException =>
          fakeDecode(a)
      }
    } else if (a.media_type == "image/png" || a.media_type == "image/jpeg") {
      try {
        decodeImage(a.content) match {
          case Some((w, h, rgb)) =>
            Decoded(a.id, a.media_type, a.content.length, w, h, 3, pixelCrc(rgb))
          case None => fakeDecode(a)
        }
      } catch { case _: java.io.IOException => fakeDecode(a) }
    } else if (a.media_type == "video/y4m") {
      try {
        val (w, h, _, _, frames) = decodeY4m(a.content)
        var crc = 0L
        frames.foreach(fr => fr.foreach(b => crc = (crc * 31 + (b & 0xff)) & 0xffffffffL))
        Decoded(a.id, a.media_type, a.content.length,
          width = w, height = h, channels = frames.length, checksum = crc)
      } catch {
        case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException =>
          fakeDecode(a)
      }
    } else fakeDecode(a)

  /** Deterministic RGB test pattern for id: pixel (r,c,ch) =
    * (id*7 + r*31 + c*13 + ch*5) % 256. Width 8+id%9 (NOT a multiple of 4
    * — exercises row padding), height 5+id%7. */
  def syntheticRgb(id: Long): (Int, Int, Array[Byte]) = {
    val w = (8 + id % 9).toInt
    val h = (5 + id % 7).toInt
    val rgb = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var ch = 0
        while (ch < 3) {
          rgb((r * w + c) * 3 + ch) = ((id * 7 + r * 31 + c * 13 + ch * 5) % 256).toByte
          ch += 1
        }
        c += 1
      }
      r += 1
    }
    (w, h, rgb)
  }

  /** End-to-end BMP round trip as a distributed kernel: per id, build the
    * deterministic pattern, ENCODE to real BMP bytes, DECODE back, and
    * report stats over the DECODED pixels + the encoded file size. Any
    * header, padding, channel-order, or row-order bug changes the output —
    * the oracle recomputes the stats straight from the pattern formula. */
  def bmpRoundTripStats(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id")).as[Long].map { id =>
      val (w, h, rgb) = syntheticRgb(id)
      val bmp = encodeBmp(w, h, rgb)
      val (dw, dh, back) = decodeBmp(bmp) // one decode serves dims AND sum
      require(dw == w && dh == h, s"dimension mismatch for $id")
      var sum = 0L
      back.foreach(b => sum += (b & 0xff))
      (id, dw, dh, bmp.length, sum)
    }.toDF("id", "width", "height", "n_bytes", "pix_sum")
  }

  /** Perceptual difference-hash (dHash) over DECODED image pixels — the
    * image analogue of SimHash near-dup: encode the deterministic pattern
    * to real BMP bytes, decode, block-partition the grayscale plane into a
    * gridR x gridC mosaic and set bit (R*gridC' + C) when cell (R,C) is
    * darker than its right neighbor. Means are compared as exact integer
    * cross-products (sum_l * n_r < sum_r * n_l) so uneven block splits
    * never touch floating point — the DuckDB oracle replays the identical
    * arithmetic from the pattern formula, which means any codec bug
    * breaks the hash. Output: (id, width, height, dhash, n_same) where
    * n_same = how many images share the hash (the near-dup bucket size).
    *
    * Scale: pure map kernel + one groupBy on the 2^bits-bounded hash key.
    */
  def imageDHash(spark: SparkSession, ids: DataFrame,
      gridC: Int = 5, gridR: Int = 4): DataFrame = {
    import spark.implicits._
    val hashed = ids.select(col("id")).as[Long].map { id =>
      val (w, h, rgb) = syntheticRgb(id)
      val (dw, dh, back) = decodeBmp(encodeBmp(w, h, rgb))
      require(dw == w && dh == h, s"dimension mismatch for $id")
      val sums = Array.ofDim[Long](gridR, gridC)
      val cnts = Array.ofDim[Long](gridR, gridC)
      var r = 0
      while (r < dh) {
        val br = r * gridR / dh
        var c = 0
        while (c < dw) {
          val bc = c * gridC / dw
          val i = (r * dw + c) * 3
          sums(br)(bc) += (back(i) & 0xff) + (back(i + 1) & 0xff) +
            (back(i + 2) & 0xff)
          cnts(br)(bc) += 1
          c += 1
        }
        r += 1
      }
      var hash = 0L
      var br = 0
      while (br < gridR) {
        var bc = 0
        while (bc < gridC - 1) {
          if (sums(br)(bc) * cnts(br)(bc + 1) <
            sums(br)(bc + 1) * cnts(br)(bc))
            hash |= 1L << (br * (gridC - 1) + bc)
          bc += 1
        }
        br += 1
      }
      (id, w, h, hash)
    }.toDF("id", "width", "height", "dhash")
    // bucket size via an unordered window over the hash key: ONE pass over
    // the codec kernel (a groupBy + self-join would run the encode/decode
    // map stage twice), one shuffle on the bounded dhash key, no sort
    hashed.withColumn("n_same",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("dhash"))))
  }

  /** End-to-end PNG round trip as a distributed kernel: per id, build the
    * deterministic pattern, ENCODE via ImageIO to real PNG bytes, DECODE
    * back through the dispatching image decoder, and report stats over the
    * DECODED pixels. PNG is lossless so the oracle recomputes the stats
    * straight from the pattern formula; the (JDK-defined) encoded size is
    * deliberately NOT part of the output. */
  def pngRoundTripStats(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id")).as[Long].mapPartitions { it =>
      // ONE writer/reader per partition: the per-image cost of the
      // convenience ImageIO.write/read entry points is dominated by SPI
      // lookup + stream setup, not by deflate, at thumbnail sizes — this
      // is the batch boundary a real codec kernel wants
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      val out = it.map { id =>
        val (w, h, rgb) = syntheticRgb(id)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(toBufferedImage(w, h, rgb))
        ios.flush()
        val png = bos.toByteArray
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(png))
        reader.setInput(iis)
        val back = reader.read(0)
        require(back.getWidth == w && back.getHeight == h, s"dimension mismatch for $id")
        (id, w, h, pixelSum(back))
      }.toVector // materialize before disposing the shared writer/reader
      writer.dispose()
      reader.dispose()
      out.iterator
    }.toDF("id", "width", "height", "pix_sum")
  }

  // --------------------------------------------------------------------
  // REAL codec #3: WAV (RIFF/WAVE, 16-bit PCM) in pure byte math — the
  // reference's binary-codec family (utils.py:91-193) applied to audio:
  // a fixed little-endian header + raw samples, no library needed. The
  // canonical encoder emits the minimal 44-byte header; the decoder walks
  // the chunk list (tolerating extra chunks such as LIST/INFO before
  // `data`, with RIFF's odd-size pad byte) so reference-produced files
  // parse too.
  // --------------------------------------------------------------------

  private def le16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def wr4cc(out: Array[Byte], off: Int, cc: String): Unit = {
    var i = 0
    while (i < 4) { out(off + i) = cc.charAt(i).toByte; i += 1 }
  }
  private def is4cc(b: Array[Byte], off: Int, cc: String): Boolean =
    b(off) == cc.charAt(0).toByte && b(off + 1) == cc.charAt(1).toByte &&
      b(off + 2) == cc.charAt(2).toByte && b(off + 3) == cc.charAt(3).toByte

  /** Encode interleaved 16-bit PCM samples as a canonical RIFF/WAVE file:
    * 44-byte header (RIFF + fmt(16) + data) followed by little-endian
    * samples. Output size is format-defined (44 + 2·n) and part of the
    * oracle contract, like the BMP encoder's. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "sampleRate and channels must be positive")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of channels=$channels")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    wr4cc(out, 0, "RIFF"); le32(out, 4, 36 + dataSize); wr4cc(out, 8, "WAVE")
    wr4cc(out, 12, "fmt "); le32(out, 16, 16)
    le16(out, 20, 1) // PCM
    le16(out, 22, channels)
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * channels * 2) // byte rate
    le16(out, 32, channels * 2) // block align
    le16(out, 34, 16) // bits per sample
    wr4cc(out, 36, "data"); le32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      le16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE PCM16 payload back to (sampleRate, channels,
    * interleaved samples). Walks the chunk list — `fmt ` and `data` may be
    * separated by other chunks (LIST/INFO/fact), each padded to an even
    * boundary per the RIFF spec. Header fields are untrusted: validated
    * and bounded before any allocation. */
  def decodeWav(wav: Array[Byte]): (Int, Int, Array[Short]) = {
    require(wav.length >= 44 && is4cc(wav, 0, "RIFF") && is4cc(wav, 8, "WAVE"),
      "not a RIFF/WAVE file")
    var off = 12
    var sampleRate = 0
    var channels = 0
    var haveFmt = false
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= wav.length && (dataOff < 0 || !haveFmt)) {
      val size = rd32(wav, off + 4)
      require(size >= 0 && off + 8 + size.toLong <= wav.length,
        s"chunk at $off exceeds payload (size=$size)")
      if (is4cc(wav, off, "fmt ")) {
        require(size >= 16, "fmt chunk too short")
        require(rd16(wav, off + 8) == 1, "only PCM (format 1) supported")
        channels = rd16(wav, off + 10)
        sampleRate = rd32(wav, off + 12)
        require(rd16(wav, off + 22) == 16, "only 16-bit PCM supported")
        require(channels > 0 && channels <= 64, s"implausible channel count $channels")
        require(sampleRate > 0 && sampleRate <= (1 << 20),
          s"implausible sample rate $sampleRate")
        haveFmt = true
      } else if (is4cc(wav, off, "data")) {
        dataOff = off + 8
        dataLen = size
      }
      off += 8 + size + (size & 1) // RIFF pads odd chunks to even length
    }
    require(haveFmt, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(dataLen % 2 == 0, s"odd PCM16 data length $dataLen")
    val n = dataLen / 2
    require(n % channels == 0, s"data not frame-aligned: $n samples, $channels channels")
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((wav(dataOff + i * 2) & 0xff) |
        ((wav(dataOff + i * 2 + 1) & 0xff) << 8)).toShort
      i += 1
    }
    (sampleRate, channels, samples)
  }

  /** Masked rolling checksum over decoded samples (the PCM twin of
    * [[pixelCrc]] — unsigned 16-bit view of each sample). */
  private def pcmCrc(samples: Array[Short]): Long = {
    var crc = 0L
    var i = 0
    while (i < samples.length) { crc = (crc * 31 + (samples(i) & 0xffff)) & 0xffffffffL; i += 1 }
    crc
  }

  /** Deterministic PCM16 test signal for id: interleaved sample i =
    * ((id·7919 + i·2663) mod 65536) − 32768 (full 16-bit swing, negative
    * values exercise two's-complement LE encoding); 200 + id%57 frames,
    * 8000 + (id%3)·4000 Hz, 1 + id%2 channels (stereo rows exercise
    * blockAlign). Pure integer math — the DuckDB oracle replays it
    * exactly. */
  def syntheticPcm(id: Long): (Int, Int, Array[Short]) = {
    val rate = (8000 + (id % 3) * 4000).toInt
    val channels = (1 + id % 2).toInt
    val n = (200 + id % 57).toInt * channels
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      s(i) = (((id * 7919 + i * 2663) % 65536) - 32768).toShort
      i += 1
    }
    (rate, channels, s)
  }

  /** End-to-end WAV round trip as a distributed kernel: per id, build the
    * deterministic signal, ENCODE to real RIFF/PCM16 bytes, DECODE back,
    * and report amplitude stats over the DECODED samples plus the
    * format-defined file size. All-integer outputs (peak / sum of |s| /
    * sum of s² / floor-div duration) — no float order sensitivity; the
    * oracle recomputes everything straight from the signal formula, so any
    * header, endianness, or sign bug changes the output. */
  def wavRoundTripStats(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id")).as[Long].map { id =>
      val (rate, ch, samples) = syntheticPcm(id)
      val wav = encodeWav(rate, ch, samples)
      val (dRate, dCh, back) = decodeWav(wav)
      require(dRate == rate && dCh == ch && back.length == samples.length,
        s"wav round-trip shape mismatch for $id")
      var sumAbs = 0L
      var sumSq = 0L
      var peak = 0
      back.foreach { sVal =>
        val v = sVal.toInt
        val a = math.abs(v)
        sumAbs += a
        sumSq += v.toLong * v
        if (a > peak) peak = a
      }
      val frames = back.length / dCh
      (id, dRate, dCh, frames.toLong, wav.length, peak, sumAbs, sumSq,
        frames.toLong * 1000L / dRate)
    }.toDF("id", "sample_rate", "channels", "n_frames", "n_bytes", "peak",
      "sum_abs", "sum_sq", "dur_ms")
  }

  // --------------------------------------------------------------------
  // REAL codec: YUV4MPEG2 ("Y4M"), the standard uncompressed video
  // interchange format (textual stream header + per-frame "FRAME\n"
  // markers + raw YUV planes). Pure byte math like BMP and WAV, so the
  // container's no-codec-library restriction doesn't force a stub for raw
  // video either; compressed video has the real MJPEG-in-AVI codec below,
  // leaving only inter-frame formats (MP4/H.264) declared.
  // C444 = full-resolution planes (a legal Y4M colourspace
  // tag), which keeps plane geometry trivially w*h per plane.
  // --------------------------------------------------------------------

  /** Encode frames (each 3*w*h bytes: Y plane, then U, then V) as a
    * spec-compliant YUV4MPEG2 stream. */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fpsNum > 0 && fpsDen > 0, "bad geometry")
    val planeLen = 3 * width * height
    frames.foreach(f => require(f.length == planeLen, "frame must be 3*w*h bytes"))
    val header = s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C444\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + frames.length * (marker.length + planeLen))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    frames.foreach { f =>
      System.arraycopy(marker, 0, out, off, marker.length)
      System.arraycopy(f, 0, out, off + marker.length, planeLen)
      off += marker.length + planeLen
    }
    out
  }

  /** Decode a YUV4MPEG2 stream back to (width, height, fpsNum, fpsDen,
    * frames). Parses the textual header tokens (magic, W/H/F required,
    * C must be 444 when present — per spec the default would be 420, whose
    * subsampled planes this decoder does not model), walks the FRAME
    * markers (frame-level parameters after "FRAME" are legal Y4M and are
    * skipped), and validates plane geometry against the payload length. */
  def decodeY4m(y4m: Array[Byte]): (Int, Int, Int, Int, Array[Array[Byte]]) = {
    val nl = y4m.indexOf('\n'.toByte)
    require(nl > 0, "not a Y4M stream: no header line")
    val header = new String(y4m, 0, nl, java.nio.charset.StandardCharsets.US_ASCII)
    val toks = header.split(" ")
    require(toks.head == "YUV4MPEG2", "not a Y4M stream: bad magic")
    var width = -1; var height = -1; var fpsNum = -1; var fpsDen = -1
    toks.tail.foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => width = t.substring(1).toInt
        case 'H' => height = t.substring(1).toInt
        case 'F' =>
          val fd = t.substring(1).split(":")
          require(fd.length == 2, s"bad frame-rate token $t")
          fpsNum = fd(0).toInt; fpsDen = fd(1).toInt
        case 'C' => require(t == "C444", s"only C444 supported, got $t")
        case _ => () // Ip/A/X... parameters: legal, irrelevant here
      }
    }
    require(width > 0 && height > 0 && fpsNum > 0 && fpsDen > 0,
      s"Y4M header missing W/H/F: $header")
    require(width <= (1 << 16) && height <= (1 << 16),
      s"implausible Y4M dimensions ${width}x$height")
    val planeLen = 3 * width * height
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = nl + 1
    while (off < y4m.length) {
      require(off + 5 <= y4m.length &&
        new String(y4m, off, 5, java.nio.charset.StandardCharsets.US_ASCII) == "FRAME",
        s"expected FRAME marker at offset $off")
      var eol = off + 5
      while (eol < y4m.length && y4m(eol) != '\n'.toByte) eol += 1
      require(eol < y4m.length, "truncated FRAME header")
      require(eol + 1 + planeLen <= y4m.length,
        "Y4M truncated: frame planes exceed payload")
      frames += java.util.Arrays.copyOfRange(y4m, eol + 1, eol + 1 + planeLen)
      off = eol + 1 + planeLen
    }
    (width, height, fpsNum, fpsDen, frames.toArray)
  }

  /** Deterministic YUV test clip for id: geometry w=8+(id%5)*4,
    * h=6+(id%3)*4, 3+id%4 frames at 25:1; plane p of frame f has pixel
    * i = (id*31 + f*17 + p*7 + i*3) mod 256 — pure integer math the
    * DuckDB oracle replays exactly. */
  def syntheticYuv(id: Long): (Int, Int, Array[Array[Byte]]) = {
    val w = (8 + (id % 5) * 4).toInt
    val h = (6 + (id % 3) * 4).toInt
    val nf = (3 + id % 4).toInt
    val planeLen = 3 * w * h
    val frames = Array.tabulate(nf) { f =>
      val fr = new Array[Byte](planeLen)
      var p = 0
      while (p < 3) {
        var i = 0
        while (i < w * h) {
          fr(p * w * h + i) = ((id * 31 + f * 17 + p * 7 + i * 3) % 256).toByte
          i += 1
        }
        p += 1
      }
      fr
    }
    (w, h, frames)
  }

  /** End-to-end raw-video round trip as a distributed kernel (the video
    * twin of [[wavRoundTripStats]]): per id, build the deterministic clip,
    * ENCODE to real Y4M bytes, DECODE back, and emit all-integer per-frame
    * plane stats over the DECODED planes plus the format-defined stream
    * size. Long-form (id, frame_idx) output exercises the frame-sampling
    * shape a real video pipeline has; the oracle recomputes everything
    * from the pixel formula, so any header, marker, or plane-geometry bug
    * changes the output. */
  def y4mRoundTripStats(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id")).as[Long].flatMap { id =>
      val (w, h, frames) = syntheticYuv(id)
      val y4m = encodeY4m(w, h, 25, 1, frames)
      val (dw, dh, dfn, dfd, back) = decodeY4m(y4m)
      require(dw == w && dh == h && dfn == 25 && dfd == 1 &&
        back.length == frames.length,
        s"y4m round-trip shape mismatch for $id")
      back.iterator.zipWithIndex.map { case (fr, f) =>
        val n = w * h
        var ySum = 0L; var uSum = 0L; var vSum = 0L
        var yMin = 255; var yMax = 0
        var i = 0
        while (i < n) {
          val y = fr(i) & 0xff
          ySum += y
          if (y < yMin) yMin = y
          if (y > yMax) yMax = y
          uSum += (fr(n + i) & 0xff)
          vSum += (fr(2 * n + i) & 0xff)
          i += 1
        }
        (id, f, w, h, ySum, uSum, vSum, yMin, yMax, y4m.length)
      }
    }.toDF("id", "frame_idx", "width", "height", "y_sum", "u_sum", "v_sum",
      "y_min", "y_max", "n_bytes")
  }

  // --------------------------------------------------------------------
  // REAL codec: MJPEG-in-AVI — COMPRESSED video in pure byte math. Each
  // frame is a self-contained baseline JPEG (ISO/IEC 10918-1: DQT/SOF0/
  // DHT/SOS markers, canonical Huffman entropy coding with 0xFF00 byte
  // stuffing, fixed-point IDCT) wrapped in a RIFF AVI container ('hdrl'
  // headers, 'movi' '00dc' chunks, 'idx1' index). MJPEG is the one
  // compressed-video shape that needs no external codec library; the
  // inter-frame/motion-compensated leg is the GVC1 codec in Video.scala
  // (conformance-decoding FOREIGN H.264/CABAC files would still need a
  // codec library — a bitstream-compat boundary, not an operator-class
  // one). The IDCT is
  // integer (the 8192-scaled DCT basis below), so the DuckDB oracle
  // replays decoded pixels EXACTLY — no float cos crosses an engine
  // boundary.
  // --------------------------------------------------------------------

  /** Fixed-point DCT basis K(u)(x) = round(8192·C(u)·cos((2x+1)uπ/16)),
    * C(0)=1/√2 else 1 — shared verbatim by [[decodeJpeg]]'s IDCT and the
    * q142 oracle SQL (integer products, exact in any engine). */
  private[graft] val idctK: Array[Array[Int]] = Array(
    Array(5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793),
    Array(8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035),
    Array(7568, 3135, -3135, -7568, -7568, -3135, 3135, 7568),
    Array(6811, -1598, -8035, -4551, 4551, 8035, 1598, -6811),
    Array(5793, -5793, -5793, 5793, 5793, -5793, -5793, 5793),
    Array(4551, -8035, 1598, 6811, -6811, -1598, 8035, -4551),
    Array(3135, -7568, 7568, -3135, -3135, 7568, -7568, 3135),
    Array(1598, -4551, 6811, -8035, 8035, -6811, 4551, -1598))

  /** Zigzag scan order: zigzag index -> natural (row-major v*8+u) index. */
  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance Huffman specs: (BITS counts per code length 1..16,
    * HUFFVAL symbol list). Encoder emits them in DHT; the decoder builds
    * its tables from whatever DHT declares (it is NOT hard-wired to these
    * — a foreign baseline JPEG with its own tables decodes too). */
  private val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array.tabulate(12)(identity)
  private val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman codes from a (BITS, HUFFVAL) spec: symbol ->
    * (code, length), codes assigned in spec order (10918-1 Annex C). */
  private def huffCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** MSB-first JPEG bit sink with mandatory 0xFF -> 0xFF 0x00 stuffing;
    * flush pads the final byte with 1-bits (10918-1 F.1.2.3). */
  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** Magnitude category (bit length of |v|): 0 for 0, else floor(log2)+1. */
  private def jpegCat(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode quantized coefficient blocks (natural row-major order, MCU
    * scan order) as a baseline single-component 8-bit JPEG: all-ones
    * quantization table, Annex K Huffman tables, differential DC, AC
    * run/size coding with ZRL/EOB. Pure byte math — no imaging library. */
  def encodeJpeg(width: Int, height: Int, blocks: Array[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      "encoder keeps geometry in whole 8x8 blocks")
    require(blocks.length == (width / 8) * (height / 8), "one block per MCU")
    blocks.foreach(b => require(b.length == 64, "block must be 64 coefficients"))
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1)) // DQT: Pq=0,Tq=0, all ones
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0)) // SOF0: 8-bit, 1 component id=1, 1x1 sampling, Tq=0
    seg(0xc4, Array(0x00) ++ dcBits ++ dcVals) // DHT class 0 id 0
    seg(0xc4, Array(0x10) ++ acBits ++ acVals) // DHT class 1 id 0
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS: comp 1 uses DC0/AC0
    val dcH = huffCodes(dcBits, dcVals)
    val acH = huffCodes(acBits, acVals)
    val bw = new JpegBitWriter(out)
    var prevDc = 0
    blocks.foreach { blk =>
      val zz = Array.tabulate(64)(i => blk(zigzag(i)))
      val diff = zz(0) - prevDc
      prevDc = zz(0)
      val s = jpegCat(diff)
      val (c, l) = dcH(s)
      bw.put(c, l)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      var i = 1
      var run = 0
      while (i < 64) {
        if (zz(i) == 0) run += 1
        else {
          while (run > 15) { val (zc, zl) = acH(0xf0); bw.put(zc, zl); run -= 16 }
          val sz = jpegCat(zz(i))
          val (ac, al) = acH((run << 4) | sz)
          bw.put(ac, al)
          bw.put(if (zz(i) >= 0) zz(i) else zz(i) + (1 << sz) - 1, sz)
          run = 0
        }
        i += 1
      }
      if (run > 0) { val (ec, el) = acH(0x00); bw.put(ec, el) } // EOB
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Canonical Huffman decode tables (10918-1 F.2.2.3): per code length,
    * the smallest/largest code and the HUFFVAL offset. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(in: JpegBitReader): Int = {
      var code = in.bit()
      var l = 1
      while (maxCode(l) < code) {
        code = (code << 1) | in.bit()
        l += 1
        require(l <= 16, "corrupt JPEG: Huffman code over 16 bits")
      }
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first entropy-segment bit source with 0xFF00 unstuffing. */
  private final class JpegBitReader(b: Array[Byte], var off: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(off < b.length, "truncated JPEG entropy segment")
        val v = b(off) & 0xff
        off += 1
        if (v == 0xff) {
          require(off < b.length && b(off) == 0x00,
            "unexpected marker inside entropy segment")
          off += 1
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receiveExtend(s: Int): Int = {
      if (s == 0) 0
      else {
        var v = 0
        var i = 0
        while (i < s) { v = (v << 1) | bit(); i += 1 }
        if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
      }
    }
  }

  /** Decode a baseline single-component 8-bit JPEG back to (width, height,
    * row-major grayscale pixels). Real decoder: marker walk, DQT/DHT
    * parsed from the stream (not assumed), canonical Huffman decode,
    * dequantize + de-zigzag, fixed-point IDCT ([[idctK]], /2^28 rounded),
    * +128 level shift, clamp. Restart markers and multi-scan/progressive
    * modes are required out (baseline MJPEG frames never emit them). */
  def decodeJpeg(jpeg: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(jpeg.length > 4 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI")
    var off = 2
    var width = -1; var height = -1
    val qt = new Array[Int](64) // zigzag order, as DQT ships it
    var dcDec: HuffDecoder = null
    var acDec: HuffDecoder = null
    var sosAt = -1
    while (sosAt < 0) {
      require(off + 4 <= jpeg.length, "truncated JPEG: no SOS")
      require((jpeg(off) & 0xff) == 0xff, s"expected marker at $off")
      val m = jpeg(off + 1) & 0xff
      val len = ((jpeg(off + 2) & 0xff) << 8) | (jpeg(off + 3) & 0xff)
      val p = off + 4
      m match {
        case 0xdb =>
          require((jpeg(p) & 0xf0) == 0, "only 8-bit quant tables (Pq=0)")
          var i = 0
          while (i < 64) { qt(i) = jpeg(p + 1 + i) & 0xff; i += 1 }
        case 0xc0 =>
          require((jpeg(p) & 0xff) == 8, "baseline 8-bit precision only")
          height = ((jpeg(p + 1) & 0xff) << 8) | (jpeg(p + 2) & 0xff)
          width = ((jpeg(p + 3) & 0xff) << 8) | (jpeg(p + 4) & 0xff)
          require((jpeg(p + 5) & 0xff) == 1, "single-component JPEG only")
          require((jpeg(p + 7) & 0xff) == 0x11, "1x1 sampling only")
        case 0xc4 =>
          var q = p
          while (q < off + 2 + len) {
            val tc = (jpeg(q) & 0xf0) >> 4
            val bits = Array.tabulate(16)(i => jpeg(q + 1 + i) & 0xff)
            val nv = bits.sum
            val vals = Array.tabulate(nv)(i => jpeg(q + 17 + i) & 0xff)
            if (tc == 0) dcDec = new HuffDecoder(bits, vals)
            else acDec = new HuffDecoder(bits, vals)
            q += 17 + nv
          }
        case 0xda => sosAt = off + 2 + len
        case 0xc1 | 0xc2 | 0xc3 => require(false, "baseline SOF0 only")
        case 0xdd => require(false, "restart intervals unsupported")
        case _ => () // APPn/COM: skip
      }
      off += 2 + len
    }
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      "SOF0 missing or geometry not whole blocks")
    require(dcDec != null && acDec != null, "DHT tables missing before SOS")
    val bw = width / 8
    val bh = height / 8
    val px = new Array[Byte](width * height)
    val in = new JpegBitReader(jpeg, sosAt)
    val coef = new Array[Int](64)
    var prevDc = 0
    var mcu = 0
    while (mcu < bw * bh) {
      java.util.Arrays.fill(coef, 0)
      val s = dcDec.decode(in)
      prevDc += in.receiveExtend(s)
      coef(0) = prevDc * qt(0)
      var i = 1
      var eob = false
      while (i < 64 && !eob) {
        val rs = acDec.decode(in)
        if (rs == 0x00) eob = true
        else if (rs == 0xf0) {
          i += 16
          // i == 64 is a clean all-zero tail; past it the run overran the
          // block — reject corrupt streams loudly like the run-skip branch
          require(i <= 64, "corrupt JPEG: ZRL run past block")
        } else {
          i += (rs >> 4)
          require(i < 64, "corrupt JPEG: AC index past block")
          coef(zigzag(i)) = in.receiveExtend(rs & 15) * qt(i)
          i += 1
        }
      }
      // fixed-point IDCT: pixel = floorDiv(Σ F(v,u)·K(u,x)·K(v,y) + 2^27,
      // 2^28) + 128, clamped — all-integer, oracle-replayable
      val bx = (mcu % bw) * 8
      val by = (mcu / bw) * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0L
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              val f = coef(v * 8 + u)
              if (f != 0) acc += f.toLong * idctK(u)(x) * idctK(v)(y)
              u += 1
            }
            v += 1
          }
          val p0 = Math.floorDiv(acc + (1L << 27), 1L << 28) + 128
          val p = if (p0 < 0) 0 else if (p0 > 255) 255 else p0.toInt
          px((by + y) * width + bx + x) = p.toByte
          x += 1
        }
        y += 1
      }
      mcu += 1
    }
    (width, height, px)
  }

  /** Wrap per-frame JPEG payloads in a spec-shaped RIFF AVI container:
    * LIST hdrl (avih main header + LIST strl with a 'vids'/'MJPG' strh and
    * a BITMAPINFOHEADER strf), LIST movi with '00dc' chunks (even-padded),
    * and an idx1 keyframe index — the same pure byte math as the WAV/Y4M
    * RIFF siblings. */
  def encodeAvi(width: Int, height: Int, fps: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty, "bad AVI geometry")
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def w4cc(cc: String): Unit = cc.foreach(c => out.write(c.toInt))
    val maxSz = frames.map(_.length).max
    val pad = frames.map(f => f.length % 2)
    val moviSz = 4 + frames.zip(pad).map { case (f, p) => 8 + f.length + p }.sum
    val idxSz = 16 * frames.length
    val hdrlSz = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSz = 4 + (8 + hdrlSz) + (8 + moviSz) + (8 + idxSz)
    w4cc("RIFF"); w32(riffSz); w4cc("AVI ")
    w4cc("LIST"); w32(hdrlSz); w4cc("hdrl")
    w4cc("avih"); w32(56)
    w32(1000000 / fps); w32(0); w32(0); w32(0x10 /* HASINDEX */)
    w32(frames.length); w32(0); w32(1); w32(maxSz)
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    w4cc("LIST"); w32(4 + (8 + 56) + (8 + 40)); w4cc("strl")
    w4cc("strh"); w32(56)
    w4cc("vids"); w4cc("MJPG"); w32(0); w32(0); w32(0)
    w32(1); w32(fps); w32(0); w32(frames.length); w32(maxSz); w32(-1); w32(0)
    out.write(0); out.write(0); out.write(0); out.write(0) // rcFrame l,t
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    w4cc("strf"); w32(40)
    w32(40); w32(width); w32(height); out.write(1); out.write(0)
    out.write(24); out.write(0); w4cc("MJPG"); w32(width * height * 3)
    w32(0); w32(0); w32(0); w32(0)
    w4cc("LIST"); w32(moviSz); w4cc("movi")
    val offs = new Array[Int](frames.length)
    var rel = 4
    frames.zip(pad).zipWithIndex.foreach { case ((f, p), i) =>
      offs(i) = rel
      w4cc("00dc"); w32(f.length); f.foreach(b => out.write(b & 0xff))
      if (p == 1) out.write(0)
      rel += 8 + f.length + p
    }
    w4cc("idx1"); w32(idxSz)
    frames.zip(pad).zipWithIndex.foreach { case ((f, _), i) =>
      w4cc("00dc"); w32(0x10 /* KEYFRAME */); w32(offs(i)); w32(f.length)
    }
    out.toByteArray
  }

  /** Walk an AVI container back to (width, height, fps, per-frame JPEG
    * payloads): verifies RIFF/'AVI ' magic, reads geometry + frame count
    * from avih, iterates the LIST movi '00dc' chunks (skipping any other
    * stream's chunks and the even-padding bytes), and cross-checks the
    * recovered frame count against the header. */
  def decodeAvi(avi: Array[Byte]): (Int, Int, Int, Array[Array[Byte]]) = {
    require(avi.length >= 12 && is4cc(avi, 0, "RIFF") && is4cc(avi, 8, "AVI "),
      "not an AVI: bad RIFF magic")
    var width = -1; var height = -1; var usPerFrame = -1; var total = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 12
    while (off + 8 <= avi.length) {
      val sz = rd32(avi, off + 4)
      if (is4cc(avi, off, "LIST")) {
        if (is4cc(avi, off + 8, "hdrl")) {
          // avih is the first sub-chunk of hdrl per spec
          require(is4cc(avi, off + 12, "avih"), "hdrl without leading avih")
          val p = off + 20
          usPerFrame = rd32(avi, p)
          total = rd32(avi, p + 16)
          width = rd32(avi, p + 32)
          height = rd32(avi, p + 36)
        } else if (is4cc(avi, off + 8, "movi")) {
          var q = off + 12
          val end = off + 8 + sz
          while (q + 8 <= end) {
            val csz = rd32(avi, q + 4)
            // rd32 is a signed read and the size is attacker-controlled:
            // bound it before any copy/advance so a corrupt AVI fails as
            // such instead of surfacing a raw ArrayIndexOutOfBounds
            require(csz >= 0 && q + 8 + csz <= end,
              s"corrupt AVI: movi chunk size $csz out of bounds")
            if (is4cc(avi, q, "00dc"))
              frames += java.util.Arrays.copyOfRange(avi, q + 8, q + 8 + csz)
            q += 8 + csz + (csz % 2)
          }
        }
      }
      off += 8 + sz + (sz % 2)
    }
    require(width > 0 && height > 0 && usPerFrame > 0, "AVI missing avih header")
    require(total == frames.length,
      s"avih declares $total frames, movi carries ${frames.length}")
    (width, height, 1000000 / usPerFrame, frames.toArray)
  }

  /** Deterministic quantized-coefficient clip for id: geometry w=16+(id%3)·8,
    * h=16+(id%2)·8, 2+id%3 frames; block b of frame f carries exactly three
    * nonzero coefficients (all the oracle replays):
    *   DC            = ((id·13 + f·19 + b·7)  mod 1024) - 512
    *   AC(u=1,v=0)   = ((id·5  + f·3  + b·11) mod 513)  - 256
    *   AC(u=0,v=1)   = ((id·3  + f·7  + b·5)  mod 257)  - 128
    * — wide enough to exercise DC categories up to 10, AC sizes up to 9,
    * ZRL-free runs, and the decoder's clamp at both ends. */
  def syntheticMjpegCoefs(id: Long): (Int, Int, Array[Array[Array[Int]]]) = {
    val w = (16 + (id % 3) * 8).toInt
    val h = (16 + (id % 2) * 8).toInt
    val nf = (2 + id % 3).toInt
    val nb = (w / 8) * (h / 8)
    val frames = Array.tabulate(nf) { f =>
      Array.tabulate(nb) { b =>
        val blk = new Array[Int](64)
        blk(0) = (((id * 13 + f * 19 + b * 7) % 1024) - 512).toInt
        blk(1) = (((id * 5 + f * 3 + b * 11) % 513) - 256).toInt
        blk(8) = (((id * 3 + f * 7 + b * 5) % 257) - 128).toInt
        blk
      }
    }
    (w, h, frames)
  }

  /** End-to-end COMPRESSED-video round trip as a distributed kernel (the
    * MJPEG twin of [[y4mRoundTripStats]]): per id, build the deterministic
    * coefficient clip, Huffman-ENCODE each frame to a real baseline JPEG,
    * wrap in a real AVI, then walk the AVI and fully DECODE every JPEG
    * (markers, DHT, entropy segment, fixed-point IDCT) and emit all-integer
    * per-frame pixel stats. The oracle replays the IDCT from the
    * coefficient formula, so any Huffman, stuffing, marker, container, or
    * IDCT bug changes the output. */
  def mjpegRoundTripStats(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id")).as[Long].flatMap { id =>
      val (w, h, clip) = syntheticMjpegCoefs(id)
      val jpegs = clip.map(encodeJpeg(w, h, _))
      val avi = encodeAvi(w, h, 25, jpegs)
      val (dw, dh, dfps, back) = decodeAvi(avi)
      require(dw == w && dh == h && dfps == 25 && back.length == clip.length,
        s"AVI round-trip shape mismatch for $id")
      back.iterator.zipWithIndex.map { case (jpeg, f) =>
        val (pw, ph, px) = decodeJpeg(jpeg)
        require(pw == w && ph == h, s"JPEG geometry mismatch for $id frame $f")
        var sum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < px.length) {
          val p = px(i) & 0xff
          sum += p
          if (p < mn) mn = p
          if (p > mx) mx = p
          i += 1
        }
        (id, f, w, h, (w / 8) * (h / 8), sum, mn, mx)
      }
    }.toDF("id", "frame_idx", "width", "height", "n_blocks",
      "pix_sum", "pix_min", "pix_max")
  }

  // ================== Animated GIF89a (INTER-frame video) ==================
  // The second real video codec, and the INTER-frame one: GIF89a animation
  // stores frame 0 as a full canvas and each later frame as ONLY its
  // changed sub-rectangle, composited over the previous canvas (disposal
  // method 1, "do not dispose") — the dirty-rect inter-frame model — with
  // every frame's pixel indices LZW-compressed per the GIF spec
  // (variable-width codes 9→12 bits, LSB-first packing, clear/EOI codes,
  // 255-byte sub-blocks). MultimodalSpec cross-checks the encoder against
  // javax.imageio's INDEPENDENT GIF reader frame-by-frame, so the bytes
  // are conformant GIF, not a private dialect. The remaining leg of the
  // video family — block-transform + motion-vector coding (H.26x) — is
  // the real GVC1 codec in Video.scala (q169), closing the boundary.

  /** Synthetic animation for doc `id`: full analytic keyframe, then per
    * frame ONE 8×8 changed rectangle whose position and pixels are pure
    * functions of (id, frame) — the q142 discipline, so the DuckDB oracle
    * computes every composited canvas without parsing a byte. Pixels are
    * palette indices into the identity grayscale GCT (index i ↦ gray i).
    * Returns (w, h, frames as (rx, ry, rw, rh, pixels)). */
  def syntheticGifAnim(id: Long): (Int, Int, IndexedSeq[(Int, Int, Int, Int, Array[Byte])]) = {
    val w = 16 + (id % 3).toInt * 8
    val h = 16 + (id % 2).toInt * 8
    val nf = 2 + (id % 3).toInt
    val key = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((id * 7 + x * 3 + y * 5) % 256).toByte
    }
    val frames = (0 until nf).map { f =>
      if (f == 0) (0, 0, w, h, key)
      else {
        val rx = ((id + 3L * f) % (w - 8)).toInt
        val ry = ((id * 2 + 5L * f) % (h - 8)).toInt
        val px = Array.tabulate(8 * 8) { i =>
          val x = rx + i % 8; val y = ry + i / 8
          ((id * 11 + f * 13 + x * 3 + y * 5) % 256).toByte
        }
        (rx, ry, 8, 8, px)
      }
    }
    (w, h, frames)
  }

  /** GIF-variant LZW compress (spec appendix F): emits CLEAR, then
    * variable-width codes growing 9→12 bits; the width bump lags the
    * decoder's by one assignment (the decoder's table is one entry behind
    * — it only learns entry k while processing code k+1), and a full
    * table (4096) emits CLEAR and restarts. LSB-first bit packing. */
  private[graft] def lzwEncode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nbits = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits; nbits += codeSize
      while (nbits >= 8) { out.write((cur & 0xff).toInt); cur >>= 8; nbits -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    put(clear)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = Integer.valueOf((prefix << 8) | k)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          put(prefix)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next))
            next += 1
            // decoder bumps after ITS add of entry (next-1), which happens
            // one code later than ours — hence the +1 lag here
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else {
            put(clear)
            dict.clear(); next = eoi + 1; codeSize = minCodeSize + 1
          }
          prefix = k
        }
        i += 1
      }
      put(prefix)
    }
    put(eoi)
    if (nbits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decompress — the exact decoder mirror (KwKwK case,
    * width bump when the table reaches 2^codeSize, table freeze at 4096
    * until a CLEAR). `expected` = rw·rh pixels of the frame rect. */
  private[graft] def lzwDecode(data: Array[Byte], minCodeSize: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefixT = new Array[Int](4096)
    val suffixT = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var op = 0
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var cur = 0L; var nbits = 0; var ip = 0
    var prev = -1; var first = 0
    var done = false
    while (!done) {
      while (nbits < codeSize && ip < data.length) {
        cur |= (data(ip) & 0xffL) << nbits; ip += 1; nbits += 8
      }
      require(nbits >= codeSize, "corrupt GIF: LZW stream truncated")
      val code = (cur & ((1L << codeSize) - 1)).toInt
      cur >>= codeSize; nbits -= codeSize
      if (code == eoi) done = true
      else if (code == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else {
        var c = code
        var sp = 0
        if (c == next && prev >= 0) { // KwKwK: prev-string + its first char
          stack(sp) = first.toByte; sp += 1; c = prev
        }
        require(c < next, s"corrupt GIF: code $c beyond table $next")
        while (c > eoi) { stack(sp) = suffixT(c); sp += 1; c = prefixT(c) }
        require(c < clear, "corrupt GIF: chain ended on control code")
        first = c
        require(op + 1 + sp <= expected, "corrupt GIF: more pixels than rect")
        out(op) = c.toByte; op += 1
        while (sp > 0) { sp -= 1; out(op) = stack(sp); op += 1 }
        if (prev >= 0 && next < 4096) {
          prefixT(next) = prev; suffixT(next) = first.toByte; next += 1
          if (next >= (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(op == expected, s"corrupt GIF: decoded $op of $expected pixels")
    out
  }

  /** Write a conformant animated GIF89a: logical screen + 256-entry
    * grayscale global color table, then per frame a Graphic Control
    * Extension (disposal=1: do not dispose) + image descriptor at the
    * frame's CHANGED RECT + LZW pixel data in ≤255-byte sub-blocks. */
  def encodeGif(width: Int, height: Int,
      frames: Seq[(Int, Int, Int, Int, Array[Byte])]): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty, "bad GIF geometry")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    "GIF89a".foreach(c => out.write(c.toInt))
    w16(width); w16(height)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { case (rx, ry, rw, rh, px) =>
      require(px.length == rw * rh, "rect pixel count mismatch")
      require(rx + rw <= width && ry + rh <= height, "rect outside canvas")
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0x04) // disposal 1 (do not dispose), no transparency
      w16(4)          // delay 4/100 s
      out.write(0); out.write(0)
      out.write(0x2c) // image descriptor
      w16(rx); w16(ry); w16(rw); w16(rh)
      out.write(0)    // no local color table, not interlaced
      out.write(8)    // LZW min code size
      val lzw = lzwEncode(px, 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Parse + decode an animated GIF89a and COMPOSITE each frame onto the
    * canvas per disposal method 1 — returns (w, h, full composited canvas
    * + its rect origin per frame). Unknown extensions are skipped by the
    * generic sub-block rule, like a real decoder. */
  def decodeGif(gif: Array[Byte]): (Int, Int, IndexedSeq[(Int, Int, Array[Byte])]) = {
    require(gif.length >= 13 &&
      new String(gif, 0, 6, "US-ASCII").startsWith("GIF8"), "not a GIF")
    def u16(off: Int): Int = (gif(off) & 0xff) | ((gif(off + 1) & 0xff) << 8)
    val w = u16(6); val h = u16(8)
    val packed = gif(10) & 0xff
    var p = 13
    val gct = new Array[Byte](3 * 256)
    if ((packed & 0x80) != 0) {
      val n = 3 * (2 << (packed & 7))
      require(p + n <= gif.length, "corrupt GIF: GCT past end")
      System.arraycopy(gif, p, gct, 0, math.min(n, gct.length))
      p += n
    }
    val canvas = new Array[Byte](w * h)
    val frames = IndexedSeq.newBuilder[(Int, Int, Array[Byte])]
    var done = false
    while (!done) {
      require(p < gif.length, "corrupt GIF: missing trailer")
      (gif(p) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks, skipped generically
          p += 2
          while ({ require(p < gif.length, "corrupt GIF: ext past end")
            val n = gif(p) & 0xff; p += 1 + n; n != 0 }) ()
        case 0x2c =>
          require(p + 10 <= gif.length, "corrupt GIF: descriptor past end")
          val rx = u16(p + 1); val ry = u16(p + 3)
          val rw = u16(p + 5); val rh = u16(p + 7)
          val flags = gif(p + 9) & 0xff
          require((flags & 0x80) == 0, "local color tables unsupported")
          val interlaced = (flags & 0x40) != 0
          require(rx + rw <= w && ry + rh <= h, "corrupt GIF: rect outside canvas")
          p += 10
          val minCode = gif(p) & 0xff; p += 1
          val data = new java.io.ByteArrayOutputStream()
          while ({ require(p < gif.length, "corrupt GIF: data past end")
            val n = gif(p) & 0xff
            require(p + 1 + n <= gif.length, "corrupt GIF: sub-block past end")
            data.write(gif, p + 1, n); p += 1 + n; n != 0 }) ()
          val px = lzwDecode(data.toByteArray, minCode, rw * rh)
          // interlaced frames (GIF89a appendix E — what ImageIO's writer
          // emits by default) store rows in four passes: 0 step 8, 4 step
          // 8, 2 step 4, 1 step 2; map each stored row to its canvas row
          val rowOrder: IndexedSeq[Int] =
            if (!interlaced) 0 until rh
            else (0 until rh by 8) ++ (4 until rh by 8) ++
              (2 until rh by 4) ++ (1 until rh by 2)
          var y = 0
          while (y < rh) {
            System.arraycopy(px, y * rw, canvas, (ry + rowOrder(y)) * w + rx, rw)
            y += 1
          }
          frames += ((rx, ry, canvas.clone()))
        case other => throw new IllegalArgumentException(
          s"corrupt GIF: unknown block 0x${other.toHexString} at $p")
      }
    }
    (w, h, frames.result())
  }

  /** q157's kernel: per doc, encode the synthetic animation to GIF89a
    * bytes, decode + composite them back, and emit per-frame stats over
    * the FULL canvas — sum/min/max prove the inter-frame compositing, the
    * rect origin proves the descriptor parse. Map-only per-asset work,
    * the q142 scale shape. */
  def gifAnimRoundTripStats(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id")).as[Long].flatMap { id =>
      val (w, h, frames) = syntheticGifAnim(id)
      val gif = encodeGif(w, h, frames)
      val (dw, dh, back) = decodeGif(gif)
      require(dw == w && dh == h && back.length == frames.length,
        s"GIF round-trip shape mismatch for $id")
      back.iterator.zipWithIndex.map { case ((rx, ry, canvas), f) =>
        var sum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < canvas.length) {
          val v = canvas(i) & 0xff
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        (id, f, w, h, rx, ry, sum, mn, mx)
      }
    }.toDF("id", "frame_idx", "width", "height", "rect_x", "rect_y",
      "pix_sum", "pix_min", "pix_max")
  }

  /** STUB decoder — the degrade path for payloads that claim a decodable
    * type but fail parsing, and for FOREIGN compressed-video bitstreams
    * (conformance-decoding third-party H.264/CABAC files needs a codec
    * library this container doesn't ship). The operator CLASS those files
    * belong to — block-transform + motion-compensated video — is
    * implemented for real by [[Video]] (GVC1, q169); what remains stubbed
    * is only bitstream compatibility with external encoders. Reads real
    * bytes, produces deterministic pseudo-metadata. */
  def fakeDecode(a: Asset): Decoded = {
    val n = a.content.length
    val b0 = if (n > 0) a.content(0) & 0xff else 0
    val b1 = if (n > 1) a.content(1) & 0xff else 0
    var crc = 0L
    var i = 0
    while (i < n) { crc = (crc * 31 + (a.content(i) & 0xff)) & 0xffffffffL; i += 1 }
    Decoded(a.id, a.media_type, n,
      width = 16 + b0 % 112, height = 16 + b1 % 112,
      channels = if (a.media_type == "image/png") 3 else 1, checksum = crc)
  }

  /** Partition-wise decode: one kernel invocation per partition iterator —
    * the batch boundary a real codec (or JNI/native lib) wants. */
  def decode(spark: SparkSession, assets: DataFrame): Dataset[Decoded] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map(decodeAsset))
  }

  /** Byte-histogram feature vector (real distributed byte math, no stub):
    * 16 buckets over the payload bytes, L1-normalized floats. */
  def byteHistogramFeatures(spark: SparkSession, assets: DataFrame, bins: Int = 16): DataFrame = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val h = new Array[Double](bins)
        a.content.foreach(b => h(((b & 0xff) * bins) / 256) += 1.0)
        val n = math.max(a.content.length, 1).toDouble
        (a.id, h.map(x => math.rint(x / n * 10000) / 10000))
      }
    }.toDF("id", "features")
  }

  /** Long-form byte histogram (id, bin, freq) — the oracle-checked face of
    * the multimodal path: REAL distributed byte math over the binary
    * payloads (no stub), emitted long-form with the roundHU ratio
    * convention so DuckDB can replay it. All `bins` rows are emitted per
    * asset (zeros included). */
  def byteHistogramLong(spark: SparkSession, assets: DataFrame, bins: Int = 16): DataFrame = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      val h = new Array[Long](bins)
      a.content.foreach(b => h(((b & 0xff) * bins) / 256) += 1L)
      val n = math.max(a.content.length, 1).toDouble
      h.iterator.zipWithIndex.map { case (c, i) =>
        (a.id, i, math.floor(c / n * 10000.0 + 0.5) / 10000.0)
      }
    }.toDF("id", "bin", "freq")
  }

  /** Resize kernel: block-mean pooling of the payload to a fixed
    * `targetLen` bytes (the 1-D analogue of image resampling — a real
    * codec's resize slots in at exactly this kernel boundary). Block b
    * averages bytes [b·n/target, (b+1)·n/target); payloads shorter than
    * targetLen zero-pad. Deterministic integer math. */
  def resizeBytes(spark: SparkSession, assets: DataFrame, targetLen: Int = 32): DataFrame = {
    import spark.implicits._
    assets.as[Asset].map { a =>
      val n = a.content.length
      val out = new Array[Byte](targetLen)
      var b = 0
      while (b < targetLen) {
        val lo = b.toLong * n / targetLen
        val hi = (b + 1).toLong * n / targetLen
        if (hi > lo) {
          var s = 0L
          var i = lo
          while (i < hi) { s += (a.content(i.toInt) & 0xff); i += 1 }
          out(b) = (s / (hi - lo)).toByte
        }
        b += 1
      }
      (a.id, a.media_type, out)
    }.toDF("id", "media_type", "content")
  }

  /** Frame sampling plumbing: every `stride`-th byte as a "frame"
    * (id, media_type, frame_idx, frame_val). A real video pipeline samples
    * frames the same way — per-partition kernel emitting index + payload. */
  def frameSample(spark: SparkSession, assets: DataFrame, stride: Int = 32): DataFrame = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      Range(0, a.content.length, stride).map(i =>
        (a.id, a.media_type, i / stride, a.content(i) & 0xff))
    }.toDF("id", "media_type", "frame_idx", "frame_val")
  }

  /** Deterministic "speech-like" PCM for the audio-quality kernel: the
    * sample stream alternates 50-sample segments — segment (i/50 + id) % 4
    * == 0 is quiet (|x| <= 100), segment 2 plants hard-clipped samples at
    * every 29th index, everything else is the loud q99 noise formula. Same
    * rate/channel scheme as [[syntheticPcm]]. */
  def syntheticSpeech(id: Long): (Int, Int, Array[Short]) = {
    val rate = (8000 + (id % 3) * 4000).toInt
    val channels = (1 + id % 2).toInt
    val n = (300 + id % 97).toInt * channels
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      val seg = (i / 50 + id) % 4
      s(i) =
        if (seg == 0) ((id * 13 + i * 7) % 201 - 100).toShort
        else if (seg == 2 && i % 29 == 0)
          (if ((id + i) % 2 == 0) 32767 else -32768).toShort
        else ((id * 7919 + i * 2663) % 65536 - 32768).toShort
      i += 1
    }
    (rate, channels, s)
  }

  /** Audio quality gate over DECODED samples — the audio analogue of the
    * Gopher text rules (q30/q64): per clip, 50-sample windowed silence
    * detection (window max |x| < 512), hard-clipping rate (|x| >= 32700),
    * peak, and a keep flag. The clip goes through the REAL RIFF/PCM16
    * encode->decode round trip first, so the oracle (which replays the
    * sample formula) also proves the codec under a second signal shape.
    * All thresholds integer, all ratios integer per-mille — bit-stable
    * keep/drop boundary cross-engine.
    *
    * Scale: pure map kernel, no shuffle — one pass over the audio bytes. */
  def audioQualityStats(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id")).as[Long].map { id =>
      val (rate, ch, samples) = syntheticSpeech(id)
      val (dRate, dCh, back) = decodeWav(encodeWav(rate, ch, samples))
      require(dRate == rate && dCh == ch && back.length == samples.length,
        s"wav round-trip shape mismatch for $id")
      val n = back.length
      val nWindows = (n + 49) / 50
      var nSilent = 0L
      var nClipped = 0L
      var peak = 0
      var w = 0
      while (w < nWindows) {
        var wMax = 0
        var i = w * 50
        val hi = math.min(n, (w + 1) * 50)
        while (i < hi) {
          val a = math.abs(back(i).toInt)
          if (a > wMax) wMax = a
          if (a >= 32700) nClipped += 1
          if (a > peak) peak = a
          i += 1
        }
        if (wMax < 512) nSilent += 1
        w += 1
      }
      val silPm = nSilent * 1000L / nWindows
      val clipPm = nClipped * 1000L / n
      (id, nWindows.toLong, nSilent, silPm, nClipped, clipPm, peak,
        silPm <= 250L && clipPm <= 20L)
    }.toDF("id", "n_windows", "n_silent", "silence_permille", "n_clipped",
      "clip_permille", "peak", "keep")
  }

  /** Larger deterministic pattern for the 63-bit perceptual hash (the q88
    * 16-bit grid needs only 8x5 pixels; a 7x10 grid needs >= 10x7):
    * same pixel formula as [[syntheticRgb]], dims 16..28 x 12..20, plus a
    * `variant` term that brightens the top two rows — a perceptual
    * NEAR-duplicate of the base image (a few grid cells shift, most
    * comparisons survive), the planted positive the pair join must find. */
  def syntheticRgbL(id: Long, variant: Int): (Int, Int, Array[Byte]) = {
    val w = (16 + id % 13).toInt
    val h = (12 + id % 9).toInt
    val rgb = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        var ch = 0
        while (ch < 3) {
          val v = if (variant == 1 && r < 2) 60 else 0
          rgb((r * w + c) * 3 + ch) =
            ((id * 7 + r * 31 + c * 13 + ch * 5 + v) % 256).toByte
          ch += 1
        }
        c += 1
      }
      r += 1
    }
    (w, h, rgb)
  }

  /** dHash bits over a decoded RGB plane: gridR x gridC mosaic, bit
    * (R*(gridC-1) + C) set when cell (R,C) is darker than its right
    * neighbor, means compared as exact integer cross-products (the q88
    * kernel, grid-parameterized). Caller guarantees w >= gridC, h >= gridR
    * so every cell is non-empty. */
  def dhashBits(w: Int, h: Int, rgb: Array[Byte], gridR: Int, gridC: Int): Long = {
    val sums = Array.ofDim[Long](gridR, gridC)
    val cnts = Array.ofDim[Long](gridR, gridC)
    var r = 0
    while (r < h) {
      val br = r * gridR / h
      var c = 0
      while (c < w) {
        val bc = c * gridC / w
        val i = (r * w + c) * 3
        sums(br)(bc) += (rgb(i) & 0xff) + (rgb(i + 1) & 0xff) + (rgb(i + 2) & 0xff)
        cnts(br)(bc) += 1
        c += 1
      }
      r += 1
    }
    var hash = 0L
    var br = 0
    while (br < gridR) {
      var bc = 0
      while (bc < gridC - 1) {
        if (sums(br)(bc) * cnts(br)(bc + 1) < sums(br)(bc + 1) * cnts(br)(bc))
          hash |= 1L << (br * (gridC - 1) + bc)
        bc += 1
      }
      br += 1
    }
    hash
  }

  /** Perceptual image near-dup PAIRS — dHash hamming banding, the image
    * twin of SimHash text near-dup (q52): per id, a base image (img_id =
    * 2*id) and for id % 4 == 0 a brightness-perturbed variant (2*id + 1),
    * each through the REAL BMP encode->decode round trip into a 63-bit
    * dHash (7x10 grid — bit 63 never set, so every band/xor stays in
    * positive BIGINT range for both engines). Pairs at hamming distance
    * <= maxDist via 7 bands of 9 bits: pigeonhole-COMPLETE for maxDist <=
    * 6 (a pair differing in <= 6 bits leaves >= 1 of 7 bands intact), so
    * the banded join finds every qualifying pair and the exact
    * bit_count(xor) verify keeps only true ones.
    *
    * Scale: one codec map pass (checkpointed — the self-join must not run
    * it twice), band equi-join on a bounded key, never all-pairs. */
  def imageNearDupPairs(spark: SparkSession, ids: DataFrame,
      maxDist: Int = 6): DataFrame = {
    import spark.implicits._
    require(maxDist >= 0 && maxDist <= 6,
      s"7x9-bit banding is complete only for maxDist <= 6, got $maxDist")
    val hashed = ids.select(col("id")).as[Long].flatMap { id =>
      val variants = if (id % 4 == 0) Seq(0, 1) else Seq(0)
      variants.map { v =>
        val (w, h, rgb) = syntheticRgbL(id, v)
        val (dw, dh, back) = decodeBmp(encodeBmp(w, h, rgb))
        require(dw == w && dh == h, s"dimension mismatch for $id/$v")
        (id * 2 + v, dhashBits(dw, dh, back, 7, 10))
      }
    }.toDF("img_id", "dhash").localCheckpoint()
    val banded = hashed.select(col("img_id"), col("dhash"),
      explode(array((0 until 7).map(b => struct(
        lit(b).as("band_idx"),
        shiftright(col("dhash"), 9 * b).bitwiseAND(lit(511L)).as("band_val"))): _*))
        .as("bd"))
      .select(col("img_id"), col("dhash"),
        col("bd.band_idx").as("band_idx"), col("bd.band_val").as("band_val"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("id_a"), col("b.img_id").as("id_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }
}
