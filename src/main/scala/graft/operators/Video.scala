package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** GVC1 — a real BLOCK-TRANSFORM + MOTION-VECTOR video codec (the H.26x
  * operator class), closing the repo's last declared multimodal boundary.
  * The boundary was narrowed three times (intra-frame transform coding =
  * MJPEG-in-AVI, inter-frame dirty rects = GIF89a, both in
  * [[Multimodal]]); this file supplies the missing third leg —
  * motion-COMPENSATED prediction with a transform-coded residual — built
  * entirely from the public H.264/AVC spec structure:
  *
  *   - **Transform**: the H.264 4×4 integer core transform
  *     (Malvar et al., "Low-complexity transform and quantization in
  *     H.264/AVC", IEEE TCSVT 2003): Y = C·X·Cᵀ with
  *     C = [[1,1,1,1],[2,1,-1,-2],[1,-1,-1,1],[1,-2,2,-1]]. C has
  *     orthogonal ROWS (C·Cᵀ = diag(4,10,4,10)), so the inverse is
  *     exact in integers: 1600·X = Cᵀ·(S∘Y)·C with S(i,j) =
  *     1600/(d(i)·d(j)) ∈ {100,40,16}. H.264 proper folds the d(i)·d(j)
  *     scaling into its quantization tables (Mf/Vi) and accepts a
  *     rounding inverse; we keep the scaling explicit so that q=1 is
  *     BIT-LOSSLESS — which is what lets a DuckDB oracle replay the
  *     decoder analytically (q169).
  *   - **Motion compensation**: 8×8 macroblocks, exhaustive ±4 full
  *     search over the previous RECONSTRUCTED frame (closed-loop
  *     prediction — search over the decoder's frame, not the source,
  *     the standard discipline that prevents encoder/decoder drift),
  *     SAD cost with the deterministic tie-break (sad, |dx|+|dy|, dy,
  *     dx) ascending, edge-clamped sampling (H.263 Annex D / H.264
  *     "unrestricted MV" padding).
  *   - **Modes**: per-MB skip flag (mode 0 = no coded residual — the
  *     P_Skip shape), I-frames predict from flat 128 (toy stand-in for
  *     H.264's directional intra modes, documented).
  *   - **Entropy layer**: 4×4 zigzag scan → (run, level) RLE → LEB128
  *     varints (signed via the protobuf zigzag map) — the classic
  *     transform-sparsity coder (CAVLC's shape without the context
  *     tables; CABAC stays out of scope, stated in the scaladoc of
  *     [[Multimodal.fakeDecode]]).
  *
  * Reference anchor: the reference pipeline treats media payloads as
  * opaque binary columns (SURVEY §2 multimodal rows); this codec is the
  * decode/feature-extract kernel slotted at the same mapPartitions
  * boundary as [[Multimodal.decode]].
  *
  * Scale shape (q169): one scan of the id column, flatMap encode→decode
  * per id — embarrassingly parallel, no shuffle, no driver state; at
  * 100 TB the unit of work is one video per row exactly as here. */
object Video {

  // ---------------------------------------------------------------------
  // H.264 4×4 integer core transform (public spec, Malvar et al. 2003)
  // ---------------------------------------------------------------------

  /** Row-orthogonal forward matrix; C·Cᵀ = diag(4,10,4,10). */
  private val C: Array[Array[Int]] = Array(
    Array(1, 1, 1, 1),
    Array(2, 1, -1, -2),
    Array(1, -1, -1, 1),
    Array(1, -2, 2, -1))

  private val D: Array[Int] = Array(4, 10, 4, 10)

  /** S(i,j) = 1600 / (d(i)·d(j)) — the explicit inverse-scaling matrix
    * H.264 folds into dequantization. */
  private val S: Array[Array[Int]] = Array.tabulate(4, 4)((i, j) => 1600 / (D(i) * D(j)))

  /** Forward transform of a 4×4 block (row-major 16 ints): Y = C·X·Cᵀ. */
  private[graft] def forward4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16) // C·X
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        var s = 0; var k = 0
        while (k < 4) { s += C(i)(k) * x(k * 4 + j); k += 1 }
        t(i * 4 + j) = s; j += 1
      }
      i += 1
    }
    val y = new Array[Int](16) // (C·X)·Cᵀ
    i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        var s = 0; var k = 0
        while (k < 4) { s += t(i * 4 + k) * C(j)(k); k += 1 }
        y(i * 4 + j) = s; j += 1
      }
      i += 1
    }
    y
  }

  /** Exact-when-unquantized inverse: X = (Cᵀ·(S∘Y)·C) / 1600. For a true
    * forward output the division is exact; for dequantized input it
    * rounds half-up ((z + 800) floorDiv 1600) — deterministic on both
    * encoder (recon loop) and decoder by construction. */
  private[graft] def inverse4(y: Array[Int]): Array[Int] = {
    val w = new Array[Int](16)
    var i = 0
    while (i < 16) { w(i) = y(i) * S((i / 4) % 4)(i % 4); i += 1 }
    val t = new Array[Int](16) // Cᵀ·W
    i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        var s = 0; var k = 0
        while (k < 4) { s += C(k)(i) * w(k * 4 + j); k += 1 }
        t(i * 4 + j) = s; j += 1
      }
      i += 1
    }
    val x = new Array[Int](16) // (Cᵀ·W)·C, then /1600 rounding half-up
    i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        var s = 0; var k = 0
        while (k < 4) { s += t(i * 4 + k) * C(k)(j); k += 1 }
        x(i * 4 + j) = Math.floorDiv(s + 800, 1600); j += 1
      }
      i += 1
    }
    x
  }

  /** 4×4 zigzag scan: zigzag position → row-major index (H.264 Fig 8-8). */
  private[graft] val zigzag4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  // ---------------------------------------------------------------------
  // Varint layer (LEB128; signed via the zigzag sign-fold)
  // ---------------------------------------------------------------------

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def u(v0: Long): Unit = {
      require(v0 >= 0, s"uvarint of negative $v0")
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def s(v: Long): Unit = u((v << 1) ^ (v >> 63))
    def byte(b: Int): Unit = out.write(b)
    def bytes: Array[Byte] = out.toByteArray
  }

  private final class Reader(buf: Array[Byte]) {
    private var p = 0
    def u(): Long = {
      var v = 0L; var sh = 0
      var b = 0
      do {
        require(p < buf.length, "GVC1 truncated varint")
        b = buf(p) & 0xff; p += 1
        v |= (b & 0x7fL) << sh; sh += 7
      } while ((b & 0x80) != 0)
      v
    }
    def s(): Long = { val v = u(); (v >>> 1) ^ -(v & 1) }
    def byte(): Int = { require(p < buf.length, "GVC1 truncated"); val b = buf(p) & 0xff; p += 1; b }
    def atEnd: Boolean = p == buf.length
  }

  // ---------------------------------------------------------------------
  // Block coding
  // ---------------------------------------------------------------------

  private val Mb = 8          // macroblock edge (motion-compensation unit)
  private val Range = 4       // exhaustive search radius in pixels
  private val Magic = Array[Byte]('G', 'V', 'C', '1')

  /** Quantize one transformed coefficient: round-half-away(y / q). */
  @inline private def quant(y: Int, q: Int): Int =
    if (y >= 0) (y + q / 2) / q else -((-y + q / 2) / q)

  /** Code one quantized 4×4 (zigzag + run/level RLE): nnz, then per
    * nonzero (zero-run, level). */
  private def writeBlock(wtr: Writer, qc: Array[Int]): Unit = {
    var nnz = 0
    var i = 0
    while (i < 16) { if (qc(zigzag4(i)) != 0) nnz += 1; i += 1 }
    wtr.u(nnz.toLong)
    var run = 0
    i = 0
    while (i < 16) {
      val v = qc(zigzag4(i))
      if (v == 0) run += 1
      else { wtr.u(run.toLong); wtr.s(v.toLong); run = 0 }
      i += 1
    }
  }

  private def readBlock(rdr: Reader): Array[Int] = {
    val qc = new Array[Int](16)
    val nnz = rdr.u().toInt
    require(nnz <= 16, s"GVC1 block nnz $nnz > 16")
    var pos = 0
    var n = 0
    while (n < nnz) {
      pos += rdr.u().toInt
      require(pos < 16, "GVC1 run overflows block")
      qc(zigzag4(pos)) = rdr.s().toInt
      pos += 1; n += 1
    }
    qc
  }

  /** Transform + quantize the 8×8 residual (four 4×4 sub-blocks, order
    * (0,0),(4,0),(0,4),(4,4)); returns quantized coeffs and whether any
    * are nonzero. */
  private def codeResidual(res: Array[Int], q: Int): (Array[Array[Int]], Boolean) = {
    val subs = new Array[Array[Int]](4)
    var any = false
    var sb = 0
    while (sb < 4) {
      val ox = (sb & 1) * 4; val oy = (sb >> 1) * 4
      val x = new Array[Int](16)
      var i = 0
      while (i < 16) { x(i) = res((oy + i / 4) * Mb + ox + i % 4); i += 1 }
      val y = forward4(x)
      val qc = new Array[Int](16)
      i = 0
      while (i < 16) { qc(i) = quant(y(i), q); if (qc(i) != 0) any = true; i += 1 }
      subs(sb) = qc
      sb += 1
    }
    (subs, any)
  }

  /** Dequantize + inverse the four coded sub-blocks back into an 8×8
    * residual. */
  private def reconResidual(subs: Array[Array[Int]], q: Int): Array[Int] = {
    val res = new Array[Int](Mb * Mb)
    var sb = 0
    while (sb < 4) {
      val ox = (sb & 1) * 4; val oy = (sb >> 1) * 4
      val y = new Array[Int](16)
      var i = 0
      while (i < 16) { y(i) = subs(sb)(i) * q; i += 1 }
      val x = inverse4(y)
      i = 0
      while (i < 16) { res((oy + i / 4) * Mb + ox + i % 4) = x(i); i += 1 }
      sb += 1
    }
    res
  }

  @inline private def clampPix(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Edge-clamped sample of frame `f` (w×h) at (x, y). */
  @inline private def sample(f: Array[Byte], w: Int, h: Int, x: Int, y: Int): Int = {
    val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
    val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
    f(cy * w + cx) & 0xff
  }

  /** Exhaustive ±Range SAD search for the 8×8 block at (bx, by) of `cur`
    * against reconstructed `prev`; deterministic tie-break
    * (sad, |dx|+|dy|, dy, dx) ascending. Returns packed (dx, dy). */
  private def motionSearch(cur: Array[Byte], prev: Array[Byte], w: Int, h: Int,
      bx: Int, by: Int): (Int, Int) = {
    var best = Int.MaxValue; var bestDx = 0; var bestDy = 0
    var dy = -Range
    while (dy <= Range) {
      var dx = -Range
      while (dx <= Range) {
        var sad = 0
        var yy = 0
        while (yy < Mb) {
          var xx = 0
          while (xx < Mb) {
            val c = cur((by + yy) * w + bx + xx) & 0xff
            val p = sample(prev, w, h, bx + xx + dx, by + yy + dy)
            sad += Math.abs(c - p)
            xx += 1
          }
          yy += 1
        }
        val better = sad < best || (sad == best && {
          val m = Math.abs(dx) + Math.abs(dy)
          val bm = Math.abs(bestDx) + Math.abs(bestDy)
          m < bm || (m == bm && (dy < bestDy || (dy == bestDy && dx < bestDx)))
        })
        if (better) { best = sad; bestDx = dx; bestDy = dy }
        dx += 1
      }
      dy += 1
    }
    (bestDx, bestDy)
  }

  // ---------------------------------------------------------------------
  // Encoder / decoder
  // ---------------------------------------------------------------------

  /** One decoded frame: type ('I'/'P'), reconstructed pixels, per-MB
    * motion vectors (P-frames; empty for I), and the skip-mode count. */
  final case class DecodedFrame(ftype: Char, pix: Array[Byte],
      mvs: Array[(Int, Int)], nSkip: Int, nCoded: Int)

  final case class DecodedVideo(w: Int, h: Int, q: Int, frames: IndexedSeq[DecodedFrame])

  /** Encode grayscale frames (w, h multiples of 8) at quantizer `q`
    * (q=1 ⇒ bit-lossless round trip). Frame 0 is intra; the rest are
    * P-frames motion-compensated against the previous RECONSTRUCTED
    * frame (closed loop: the encoder runs the decoder's reconstruction
    * so prediction never drifts). */
  def encode(w: Int, h: Int, frames: IndexedSeq[Array[Byte]], q: Int = 1): Array[Byte] = {
    require(w % Mb == 0 && h % Mb == 0, s"GVC1 frame ${w}x$h not a multiple of $Mb")
    require(q >= 1, s"GVC1 quantizer $q < 1")
    require(frames.nonEmpty, "GVC1 empty frame sequence")
    frames.foreach(f => require(f.length == w * h, "GVC1 frame size mismatch"))
    val wtr = new Writer
    wtr.out.write(Magic, 0, 4)
    wtr.u(w.toLong); wtr.u(h.toLong); wtr.u(frames.length.toLong); wtr.u(q.toLong)
    var prev: Array[Byte] = null
    frames.zipWithIndex.foreach { case (cur, fi) =>
      val intra = fi == 0
      wtr.byte(if (intra) 'I' else 'P')
      val recon = new Array[Byte](w * h)
      var by = 0
      while (by < h) {
        var bx = 0
        while (bx < w) {
          val (dx, dy) =
            if (intra) (0, 0)
            else {
              val mv = motionSearch(cur, prev, w, h, bx, by)
              wtr.s(mv._1.toLong); wtr.s(mv._2.toLong)
              mv
            }
          // prediction: flat 128 (intra) or MC from previous recon
          val pred = new Array[Int](Mb * Mb)
          val res = new Array[Int](Mb * Mb)
          var yy = 0
          while (yy < Mb) {
            var xx = 0
            while (xx < Mb) {
              val p = if (intra) 128 else sample(prev, w, h, bx + xx + dx, by + yy + dy)
              pred(yy * Mb + xx) = p
              res(yy * Mb + xx) = (cur((by + yy) * w + bx + xx) & 0xff) - p
              xx += 1
            }
            yy += 1
          }
          val (subs, any) = codeResidual(res, q)
          if (!any) {
            wtr.byte(0) // skip mode: prediction carries the block
            var i = 0
            while (i < Mb * Mb) {
              val yy2 = i / Mb; val xx2 = i % Mb
              recon((by + yy2) * w + bx + xx2) = clampPix(pred(i)).toByte
              i += 1
            }
          } else {
            wtr.byte(1)
            subs.foreach(writeBlock(wtr, _))
            val rres = reconResidual(subs, q)
            var i = 0
            while (i < Mb * Mb) {
              val yy2 = i / Mb; val xx2 = i % Mb
              recon((by + yy2) * w + bx + xx2) = clampPix(pred(i) + rres(i)).toByte
              i += 1
            }
          }
          bx += Mb
        }
        by += Mb
      }
      prev = recon
    }
    wtr.bytes
  }

  /** Encode every frame intra (no motion compensation) — the honesty
    * baseline: for translating content the P-frame stream must beat
    * this, or the MC layer isn't earning its bytes (VideoCodecSpec). */
  def encodeAllIntra(w: Int, h: Int, frames: IndexedSeq[Array[Byte]], q: Int = 1): Array[Byte] =
    frames.map(f => encode(w, h, IndexedSeq(f), q))
      .reduceLeft((a, b) => a ++ b)

  /** Decode a GVC1 stream to reconstructed frames + per-MB motion data. */
  def decode(bytes: Array[Byte]): DecodedVideo = {
    require(bytes.length > 4 && bytes(0) == 'G' && bytes(1) == 'V' &&
      bytes(2) == 'C' && bytes(3) == '1', "not a GVC1 stream")
    val rdr = new Reader(java.util.Arrays.copyOfRange(bytes, 4, bytes.length))
    val w = rdr.u().toInt; val h = rdr.u().toInt
    val nf = rdr.u().toInt; val q = rdr.u().toInt
    require(w > 0 && h > 0 && w % Mb == 0 && h % Mb == 0, s"GVC1 bad dims ${w}x$h")
    require(nf > 0 && q >= 1, s"GVC1 bad header nf=$nf q=$q")
    val mbPerFrame = (w / Mb) * (h / Mb)
    var prev: Array[Byte] = null
    val frames = (0 until nf).map { _ =>
      val ftype = rdr.byte().toChar
      require(ftype == 'I' || ftype == 'P', s"GVC1 bad frame type $ftype")
      val intra = ftype == 'I'
      require(intra || prev != null, "GVC1 P-frame with no reference frame")
      val recon = new Array[Byte](w * h)
      val mvs = if (intra) Array.empty[(Int, Int)] else new Array[(Int, Int)](mbPerFrame)
      var nSkip = 0; var nCoded = 0
      var mb = 0
      var by = 0
      while (by < h) {
        var bx = 0
        while (bx < w) {
          var dx = 0; var dy = 0
          if (!intra) {
            dx = rdr.s().toInt; dy = rdr.s().toInt
            require(Math.abs(dx) <= Range && Math.abs(dy) <= Range, s"GVC1 MV ($dx,$dy) out of range")
            mvs(mb) = (dx, dy)
          }
          val pred = new Array[Int](Mb * Mb)
          var i = 0
          while (i < Mb * Mb) {
            val yy = i / Mb; val xx = i % Mb
            pred(i) = if (intra) 128 else sample(prev, w, h, bx + xx + dx, by + yy + dy)
            i += 1
          }
          val mode = rdr.byte()
          require(mode == 0 || mode == 1, s"GVC1 bad MB mode $mode")
          if (mode == 0) {
            nSkip += 1
            i = 0
            while (i < Mb * Mb) {
              val yy = i / Mb; val xx = i % Mb
              recon((by + yy) * w + bx + xx) = clampPix(pred(i)).toByte
              i += 1
            }
          } else {
            nCoded += 1
            val subs = Array.fill(4)(readBlock(rdr))
            val res = reconResidual(subs, q)
            i = 0
            while (i < Mb * Mb) {
              val yy = i / Mb; val xx = i % Mb
              recon((by + yy) * w + bx + xx) = clampPix(pred(i) + res(i)).toByte
              i += 1
            }
          }
          mb += 1; bx += Mb
        }
        by += Mb
      }
      prev = recon
      DecodedFrame(ftype, recon, mvs, nSkip, nCoded)
    }
    require(rdr.atEnd, "GVC1 trailing bytes after last frame")
    DecodedVideo(w, h, q, frames)
  }

  // ---------------------------------------------------------------------
  // Synthetic corpus + the oracle-checked Spark operator (q169)
  // ---------------------------------------------------------------------

  /** Infinite analytic pattern; the +64 shift keeps both coordinates
    * nonnegative for every reachable (u, v) so Scala % and DuckDB % agree
    * without floorMod gymnastics. Quadratic terms make translated copies
    * UNIQUE (a pure gradient mod 256 has aliased shifts), so the planted
    * motion is the only zero-SAD vector for interior blocks —
    * spec-pinned, not oracle-load-bearing. */
  @inline private[graft] def pat(id: Long, u: Int, v: Int): Int = {
    val a = (u + 64).toLong; val b = (v + 64).toLong
    ((id * 7 + 3 * a * a + 5 * b * b + a * b) % 256).toInt
  }

  /** Synthetic sequence for doc `id`: frame f is the infinite pattern
    * sampled at (x + f·dx, y + f·dy) — a pure global translation with
    * fresh content scrolling in at the edges (what motion compensation
    * is FOR). All parameters are pure functions of id, so the DuckDB
    * oracle computes every frame without parsing a byte (the q142/q157
    * discipline). */
  private[graft] def syntheticVideo(id: Long): (Int, Int, Int, Int, IndexedSeq[Array[Byte]]) = {
    val w = 16 + (id % 3).toInt * 8
    val h = 16 + (id % 2).toInt * 8
    val nf = 3 + (id % 3).toInt
    val dx = (id % 9).toInt - 4
    val dy = ((id * 3) % 9).toInt - 4
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h) { i =>
        pat(id, i % w + f * dx, i / w + f * dy).toByte
      }
    }
    (w, h, dx, dy, frames)
  }

  /** q169: full encode → bitstream → decode round trip per document at
    * q=1 (bit-lossless), emitting per-frame reconstruction stats +
    * parsed frame type. The oracle computes the same stats analytically
    * from the generating formula, so a hash match proves the ENTIRE
    * codec path — header, MV varints, mode flags, run/level blocks,
    * inverse transform, motion-compensated reconstruction — end to end:
    * one wrong byte anywhere desynchronizes the stream and breaks the
    * equality. One scan, flatMap per id, no shuffle. */
  def videoRoundTripStats(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("id")).as[Long].flatMap { id =>
      val (w, h, _, _, frames) = syntheticVideo(id)
      val bytes = encode(w, h, frames, q = 1)
      val dec = decode(bytes)
      require(dec.w == w && dec.h == h && dec.frames.length == frames.length,
        s"GVC1 round-trip shape mismatch for $id")
      dec.frames.iterator.zipWithIndex.map { case (fr, f) =>
        var sum = 0L; var mn = 255; var mx = 0
        var i = 0
        while (i < fr.pix.length) {
          val v = fr.pix(i) & 0xff
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        (id, f, w, h, fr.ftype.toString, sum, mn, mx)
      }
    }.toDF("id", "frame_idx", "width", "height", "frame_type",
      "pix_sum", "pix_min", "pix_max")
  }
}
