package graft

import graft.operators.Video

/** GVC1 block-transform + motion-vector codec (the H.26x operator class;
  * q169's kernel). The lossless q=1 round trip is what the DuckDB oracle
  * leans on; everything motion-search-shaped (MV recovery, tie-break,
  * skip modes, compression gain) is pinned here because the oracle is
  * deliberately tie-independent. */
class VideoCodecSpec extends SparkSpec {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randFrame(w: Int, h: Int, seed: Long): Array[Byte] = {
    val r = rng(seed)
    Array.fill(w * h)(r.nextInt(256).toByte)
  }

  // ---- transform layer ----

  test("4x4 integer transform: inverse4(forward4(x)) is the identity on full range") {
    val r = rng(1L)
    for (_ <- 0 until 200) {
      val x = Array.fill(16)(r.nextInt(511) - 255) // residual range
      assert(Video.inverse4(Video.forward4(x)).toSeq === x.toSeq)
    }
  }

  test("4x4 transform matches the naive matrix identity 1600*X = C^T (S∘(C X C^T)) C") {
    // independent reference: textbook matrix multiplies over BigInt — no
    // shared code path with the codec's int loops
    val C = Array(Array(1, 1, 1, 1), Array(2, 1, -1, -2),
      Array(1, -1, -1, 1), Array(1, -2, 2, -1))
    val d = Array(4, 10, 4, 10)
    def mm(a: Array[Array[BigInt]], b: Array[Array[BigInt]]) =
      Array.tabulate(4, 4)((i, j) => (0 until 4).map(k => a(i)(k) * b(k)(j)).sum)
    val r = rng(2L)
    for (_ <- 0 until 50) {
      val x = Array.fill(16)(r.nextInt(511) - 255)
      val xm = Array.tabulate(4, 4)((i, j) => BigInt(x(i * 4 + j)))
      val cm = Array.tabulate(4, 4)((i, j) => BigInt(C(i)(j)))
      val ct = Array.tabulate(4, 4)((i, j) => BigInt(C(j)(i)))
      val y = mm(mm(cm, xm), ct)
      val w = Array.tabulate(4, 4)((i, j) => y(i)(j) * (1600 / (d(i) * d(j))))
      val z = mm(mm(ct, w), cm)
      for (i <- 0 until 4; j <- 0 until 4)
        assert(z(i)(j) === BigInt(1600) * BigInt(x(i * 4 + j)), s"($i,$j)")
    }
  }

  // ---- lossless round trip (the oracle's load-bearing property) ----

  test("q=1 round trip is bit-lossless on random frames, all synthetic sizes") {
    for (seed <- 0L until 6L) {
      val w = 16 + (seed % 3).toInt * 8
      val h = 16 + (seed % 2).toInt * 8
      val frames = (0 until 4).map(f => randFrame(w, h, seed * 100 + f))
      val dec = Video.decode(Video.encode(w, h, frames, q = 1))
      assert(dec.w === w && dec.h === h && dec.q === 1)
      assert(dec.frames.length === 4)
      assert(dec.frames.head.ftype === 'I')
      dec.frames.tail.foreach(f => assert(f.ftype === 'P'))
      for (f <- frames.indices)
        assert(dec.frames(f).pix.toSeq === frames(f).toSeq, s"frame $f")
    }
  }

  test("q=1 round trip is bit-lossless on the q169 synthetic corpus") {
    for (id <- 0L until 12L) {
      val (w, h, _, _, frames) = Video.syntheticVideo(id)
      val dec = Video.decode(Video.encode(w, h, frames, q = 1))
      for (f <- frames.indices)
        assert(dec.frames(f).pix.toSeq === frames(f).toSeq, s"id $id frame $f")
    }
  }

  // ---- lossy path ----

  test("q=4 decode matches an independent reconstruction model and bounds error") {
    // reference model: replay quantization + the rounding inverse with
    // plain matrix math (BigInt), walking the DECODER's own parse output
    // only through its reported MVs — the transform arithmetic is
    // recomputed independently
    val w = 16; val h = 16; val q = 4
    val frames = (0 until 3).map(f => randFrame(w, h, 40L + f))
    val bytes = Video.encode(w, h, frames, q)
    val dec = Video.decode(bytes)
    assert(dec.q === q)
    val C = Array(Array(1, 1, 1, 1), Array(2, 1, -1, -2),
      Array(1, -1, -1, 1), Array(1, -2, 2, -1))
    val d = Array(4, 10, 4, 10)
    def fwd(x: Array[Int]): Array[Int] = {
      val y = new Array[Int](16)
      for (i <- 0 until 4; j <- 0 until 4)
        y(i * 4 + j) = (for (k <- 0 until 4; l <- 0 until 4)
          yield C(i)(k) * x(k * 4 + l) * C(j)(l)).sum
      y
    }
    def inv(y: Array[Int]): Array[Int] = {
      val x = new Array[Int](16)
      for (i <- 0 until 4; j <- 0 until 4) {
        val z = (for (k <- 0 until 4; l <- 0 until 4)
          yield C(k)(i) * (y(k * 4 + l) * (1600 / (d(k) * d(l)))) * C(l)(j)).sum
        x(i * 4 + j) = Math.floorDiv(z + 800, 1600)
      }
      x
    }
    def quant(v: Int): Int = if (v >= 0) (v + q / 2) / q else -((-v + q / 2) / q)
    var prev: Array[Int] = null
    for (f <- frames.indices) {
      val intra = f == 0
      val want = new Array[Int](w * h)
      for (by <- 0 until h by 8; bx <- 0 until w by 8) {
        val mb = (by / 8) * (w / 8) + bx / 8
        val (dx, dy) = if (intra) (0, 0) else dec.frames(f).mvs(mb)
        val pred = Array.tabulate(64) { i =>
          val x = bx + i % 8 + dx; val y = by + i / 8 + dy
          if (intra) 128
          else prev(math.max(0, math.min(h - 1, y)) * w + math.max(0, math.min(w - 1, x)))
        }
        val res = Array.tabulate(64)(i =>
          (frames(f)((by + i / 8) * w + bx + i % 8) & 0xff) - pred(i))
        val rres = new Array[Int](64)
        var allZero = true
        for (sb <- 0 until 4) {
          val ox = (sb & 1) * 4; val oy = (sb >> 1) * 4
          val x44 = Array.tabulate(16)(i => res((oy + i / 4) * 8 + ox + i % 4))
          val qc = fwd(x44).map(quant)
          if (qc.exists(_ != 0)) allZero = false
          val r44 = inv(qc.map(_ * q))
          for (i <- 0 until 16) rres((oy + i / 4) * 8 + ox + i % 4) = r44(i)
        }
        for (i <- 0 until 64) {
          val v = if (allZero) pred(i) else pred(i) + rres(i)
          want((by + i / 8) * w + bx + i % 8) = math.max(0, math.min(255, v))
        }
      }
      assert(dec.frames(f).pix.map(_ & 0xff).toSeq === want.toSeq, s"frame $f")
      prev = want
    }
  }

  // ---- motion layer ----

  test("motion search recovers the planted global translation on interior blocks") {
    for (id <- Seq(1L, 5L, 7L, 11L)) {
      val (w, h, dx, dy, frames) = Video.syntheticVideo(id)
      val dec = Video.decode(Video.encode(w, h, frames, q = 1))
      val bw = w / 8
      for (f <- 1 until frames.length) {
        for (mby <- 0 until h / 8; mbx <- 0 until bw) {
          // interior = the true-MV source block lies fully inside the frame
          val inX = mbx * 8 + dx >= 0 && mbx * 8 + 8 + dx <= w
          val inY = mby * 8 + dy >= 0 && mby * 8 + 8 + dy <= h
          if (inX && inY) {
            // the quadratic pattern makes the planted shift the unique
            // zero-SAD vector, so search must return exactly (dx, dy)
            assert(dec.frames(f).mvs(mby * bw + mbx) === ((dx, dy)),
              s"id $id frame $f MB ($mbx,$mby)")
          }
        }
      }
    }
  }

  test("interior blocks of a pure translation are skip-coded at q=1") {
    val (w, h, dx, dy, frames) = Video.syntheticVideo(1L) // dx,dy != 0
    assert(dx != 0 || dy != 0)
    val dec = Video.decode(Video.encode(w, h, frames, q = 1))
    for (f <- 1 until frames.length) {
      val interior = (for (mby <- 0 until h / 8; mbx <- 0 until w / 8
        if mbx * 8 + dx >= 0 && mbx * 8 + 8 + dx <= w &&
           mby * 8 + dy >= 0 && mby * 8 + 8 + dy <= h) yield 1).sum
      assert(dec.frames(f).nSkip >= interior, s"frame $f")
    }
  }

  test("flat frames tie-break to MV (0,0) and skip everywhere") {
    val w = 16; val h = 16
    val frames = IndexedSeq.fill(3)(Array.fill(w * h)(77.toByte))
    val dec = Video.decode(Video.encode(w, h, frames, q = 1))
    for (f <- 1 until 3) {
      assert(dec.frames(f).mvs.forall(_ == ((0, 0))), s"frame $f")
      assert(dec.frames(f).nSkip === 4 && dec.frames(f).nCoded === 0)
    }
  }

  test("motion compensation earns its bytes: P-stream beats all-intra on translation") {
    for (id <- Seq(1L, 4L, 8L)) {
      val (w, h, _, _, frames) = Video.syntheticVideo(id)
      val mc = Video.encode(w, h, frames, q = 1).length
      val intra = Video.encodeAllIntra(w, h, frames, q = 1).length
      // edge MBs (fresh scrolled-in content) stay residual-coded, so the
      // bound is 60% rather than the interior-only ~0: MC must at least
      // buy back every interior block
      assert(mc < intra * 6 / 10, s"id $id: MC $mc bytes vs all-intra $intra")
    }
  }

  // ---- robustness ----

  test("decoder rejects bad magic, truncation, and malformed MBs loudly") {
    val (w, h, _, _, frames) = Video.syntheticVideo(2L)
    val good = Video.encode(w, h, frames, q = 1)
    val badMagic = good.clone(); badMagic(0) = 'X'
    assertThrows[IllegalArgumentException](Video.decode(badMagic))
    assertThrows[IllegalArgumentException](
      Video.decode(java.util.Arrays.copyOfRange(good, 0, good.length - 3)))
    assertThrows[IllegalArgumentException](
      Video.decode(good ++ Array[Byte](0)))
  }

  test("single-frame video and q169 operator shape") {
    val one = Video.decode(Video.encode(16, 16, IndexedSeq(randFrame(16, 16, 9L)), q = 1))
    assert(one.frames.length === 1 && one.frames.head.ftype === 'I')

    import spark.implicits._
    val ids = spark.range(0, 8).toDF("id")
    val out = Video.videoRoundTripStats(spark, ids).collect()
    val byId = out.groupBy(_.getLong(0))
    for (id <- 0L until 8L) {
      val (w, h, _, _, frames) = Video.syntheticVideo(id)
      val rows = byId(id).sortBy(_.getInt(1))
      assert(rows.length === frames.length)
      for ((row, f) <- rows.zipWithIndex) {
        assert(row.getInt(2) === w && row.getInt(3) === h)
        assert(row.getString(4) === (if (f == 0) "I" else "P"))
        val px = frames(f).map(_ & 0xff)
        assert(row.getLong(5) === px.map(_.toLong).sum)
        assert(row.getInt(6) === px.min && row.getInt(7) === px.max)
      }
    }
  }
}
