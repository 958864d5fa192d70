package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Streaming, TextStats}

class TextStreamSpec extends SparkSpec {
  import spark.implicits._

  test("langId predicts via stopword ratios with deterministic ties") {
    val d = Seq(
      (0L, "the cat and the dog of the house"), // en stopwords
      (1L, "der hund und die katze ist hier"), // de stopwords
      (2L, "xyzzy plugh quux")) // no stopwords anywhere
      .toDF("id", "text")
    val got = TextStats.langId(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "en")
    assert(got(1L) === "de")
    assert(got(2L) === "und")
  }

  test("qualityScore bounds and monotonicity in word count") {
    val d = Seq((0L, "short text"), (1L, ("the word " * 120).trim)).toDF("id", "text")
    val q = TextStats.qualityScore(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("quality"))).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(0L))
  }

  test("tokenCounts: regex tokens >= whitespace words") {
    val d = Seq((0L, "hello world 42 x!")).toDF("id", "text")
    val r = TextStats.tokenCounts(d).head()
    assert(r.getInt(1) === 4) // words
    assert(r.getInt(2) === 6) // hello, world, 4, 2, x, !
  }

  test("fingerprint is stable and discriminative") {
    val d = Seq(
      (0L, "a b c d e f g h"), (1L, "a b c d e f g h"), (2L, "z y x w v u t s"))
      .toDF("id", "text")
    val fp = TextStats.fingerprint(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) === fp(1L))
    assert(fp(0L) !== fp(2L))
    assert(fp(0L).split('|').length === 5)
  }

  test("BMP codec: exact round-trip, spec-compliant bytes (ImageIO cross-check)") {
    // round-trip identity on padded (w=10) and unpadded (w=8) widths
    for (id <- Seq(0L, 2L, 5L, 13L)) {
      val (w, h, rgb) = Multimodal.syntheticRgb(id)
      val bmp = Multimodal.encodeBmp(w, h, rgb)
      val (dw, dh, back) = Multimodal.decodeBmp(bmp)
      assert(dw === w && dh === h)
      assert(back.toSeq === rgb.toSeq, s"round-trip mismatch for id=$id")
      // the JDK's own BMP reader must agree — proves spec compliance, not
      // just encoder/decoder symmetry
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
      assert(img.getWidth === w && img.getHeight === h)
      for (r <- 0 until h; c <- 0 until w) {
        val px = img.getRGB(c, r)
        val i = (r * w + c) * 3
        assert(((px >> 16) & 0xff) === (rgb(i) & 0xff), s"R mismatch at ($r,$c)")
        assert(((px >> 8) & 0xff) === (rgb(i + 1) & 0xff), s"G mismatch at ($r,$c)")
        assert((px & 0xff) === (rgb(i + 2) & 0xff), s"B mismatch at ($r,$c)")
      }
    }
    // dispatching decoder: BMP metadata comes from the real header
    val (w0, h0, rgb0) = Multimodal.syntheticRgb(3L)
    val dec = Multimodal.decodeAsset(
      Multimodal.Asset(3L, "image/bmp", Multimodal.encodeBmp(w0, h0, rgb0)))
    assert(dec.width === w0 && dec.height === h0 && dec.channels === 3)
  }

  test("WAV codec: exact round-trip; chunk walk tolerates extra chunks; corrupt falls back") {
    // round-trip identity across mono/stereo and all three sample rates
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L)) {
      val (rate, ch, samples) = Multimodal.syntheticPcm(id)
      val wav = Multimodal.encodeWav(rate, ch, samples)
      assert(wav.length === 44 + 2 * samples.length)
      val (dRate, dCh, back) = Multimodal.decodeWav(wav)
      assert(dRate === rate && dCh === ch)
      assert(back.toSeq === samples.toSeq, s"round-trip mismatch for id=$id")
    }
    // a LIST chunk (odd size -> pad byte) between fmt and data must not
    // confuse the chunk walk — reference-produced WAVs carry INFO chunks
    val (rate, ch, samples) = Multimodal.syntheticPcm(7L)
    val plain = Multimodal.encodeWav(rate, ch, samples)
    val info = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'I', 'N', 'F', 'O', 'x', 0)
    val withList = plain.take(36) ++ info ++ plain.drop(36)
    // fix RIFF size field (bytes 4-7) for the inserted chunk
    val riffSize = withList.length - 8
    for (i <- 0 until 4) withList(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte
    val (r2, c2, back2) = Multimodal.decodeWav(withList)
    assert(r2 === rate && c2 === ch && back2.toSeq === samples.toSeq)
    // dispatching decoder: real WAV metadata (frames, rate, channels)
    val dec = Multimodal.decodeAsset(Multimodal.Asset(7L, "audio/wav", plain))
    assert(dec.width === samples.length / ch && dec.height === rate &&
      dec.channels === ch)
    // corrupt payload degrades to the stub instead of failing
    val junk = Array.fill[Byte](64)(42)
    val fake = Multimodal.decodeAsset(Multimodal.Asset(8L, "audio/wav", junk))
    assert(fake === Multimodal.fakeDecode(Multimodal.Asset(8L, "audio/wav", junk)))
    // truncated data chunk is rejected, not silently mis-decoded
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(plain.take(plain.length - 3))
    }
  }

  test("imageDHash: hash matches a hand computation; bucket sizes consistent") {
    import graft.operators.Multimodal
    val ids = Seq(3L, 12L, 3L + 63L).toDF("id") // 3 and 66 share (w,h) dims
    val r = Multimodal.imageDHash(spark, ids.distinct()).orderBy("id")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getLong(3)))
    // hand-replay the kernel for id=3 straight from the pattern formula
    def handHash(id: Long): (Int, Int, Long) = {
      val w = (8 + id % 9).toInt; val h = (5 + id % 7).toInt
      val s = Array.ofDim[Long](4, 5); val n = Array.ofDim[Long](4, 5)
      for (rr <- 0 until h; cc <- 0 until w) {
        val g = (0 until 3).map(ch => (id * 7 + rr * 31 + cc * 13 + ch * 5) % 256).sum
        s(rr * 4 / h)(cc * 5 / w) += g; n(rr * 4 / h)(cc * 5 / w) += 1
      }
      var hash = 0L
      for (br <- 0 until 4; bc <- 0 until 4)
        if (s(br)(bc) * n(br)(bc + 1) < s(br)(bc + 1) * n(br)(bc))
          hash |= 1L << (br * 4 + bc)
      (w, h, hash)
    }
    for ((id, w, h, dh) <- r) {
      val (ew, eh, ehash) = handHash(id)
      assert((w, h, dh) === ((ew, eh, ehash)), s"id=$id")
    }
    // n_same is the exact hash-bucket count
    val counts = Multimodal.imageDHash(spark, ids.distinct())
      .groupBy("dhash").agg(max("n_same").as("m"), count(lit(1)).as("c"))
      .collect()
    assert(counts.forall(x => x.getLong(1) === x.getLong(2)))
  }

  test("contamination: planted benchmark copy flagged, self-match excluded") {
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("bench_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // the benchmark doc itself
      (2L, "alpha beta gamma delta epsilon zeta eta theta extra words"), // shares an 8-gram
      (3L, "completely different words with no overlap at all here now"))
      .toDF("id", "text")
    val r = TextStats.contamination(docs, bench, n = 8)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r(1L) === false) // self-match excluded
    assert(r(2L) === true)
    assert(r(3L) === false)
  }

  test("lmScore: consistent continuations beat scattered ones; short docs null") {
    // shared vocabulary, different predictability: doc 1 always follows
    // `a` with `b` (P(b|a) = 3/6); doc 2 follows `a` with a different
    // word each time (P = 1/6 each) — the LM must prefer doc 1
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a c a d a e"),
      (3L, "single"))
      .toDF("id", "text")
    val r = TextStats.lmScore(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), Option(x.get(2))))).toMap
    assert(r(3L) === ((0L, None)))
    assert(r(1L)._1 === 5L && r(2L)._1 === 5L)
    val s1 = r(1L)._2.get.asInstanceOf[Double]
    val s2 = r(2L)._2.get.asInstanceOf[Double]
    assert(s1 > s2, s"consistent $s1 should beat scattered $s2")
    // hand-check doc 1: 3·ln(3/6) + 2·ln(2/3), averaged over 5 bigrams
    val expected = math.floor(
      ((3 * math.log(3.0 / 6) + 2 * math.log(2.0 / 3)) / 5) * 1e4 + 0.5) / 1e4
    assert(s1 === expected)
  }

  test("PNG codec: lossless round-trip via ImageIO; corrupt input degrades to stub") {
    for (id <- Seq(0L, 2L, 5L, 13L)) {
      val (w, h, rgb) = Multimodal.syntheticRgb(id)
      val png = Multimodal.encodePng(w, h, rgb)
      // PNG magic
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P' && png(2) === 'N' && png(3) === 'G')
      val (dw, dh, back) = Multimodal.decodeImage(png).get
      assert(dw === w && dh === h)
      assert(back.toSeq === rgb.toSeq, s"round-trip mismatch for id=$id")
    }
    // dispatching decoder: real PNG metadata comes from the real decode
    val (w0, h0, rgb0) = Multimodal.syntheticRgb(3L)
    val dec = Multimodal.decodeAsset(
      Multimodal.Asset(3L, "image/png", Multimodal.encodePng(w0, h0, rgb0)))
    assert(dec.width === w0 && dec.height === h0 && dec.channels === 3)
    // non-PNG bytes labeled image/png degrade to the deterministic stub
    // (the q36 synthetic-assets contract)
    val junk = "not a png at all".getBytes("UTF-8")
    val fake = Multimodal.decodeAsset(Multimodal.Asset(7L, "image/png", junk))
    assert(fake === Multimodal.fakeDecode(Multimodal.Asset(7L, "image/png", junk)))
    // ImageIO sniffs content, not the label: image/jpeg with PNG bytes
    // still decodes — metadata reflects the actual pixels
    val viaJpeg = Multimodal.decodeAsset(
      Multimodal.Asset(9L, "image/jpeg", Multimodal.encodePng(w0, h0, rgb0)))
    assert(viaJpeg.width === w0 && viaJpeg.height === h0)
  }

  test("multimodal decode kernel: deterministic metadata from real bytes") {
    val assets = Multimodal.syntheticAssets(
      Tables.documents(spark, sf0).select(col("doc_id").as("id"), col("text")))
    val dec = Multimodal.decode(spark, assets)
    assert(dec.count() === 500)
    val d0 = dec.filter(_.id == 0L).head()
    assert(d0.n_bytes > 0 && d0.width >= 16 && d0.width < 128)
    // features: 16-bin L1-normalized histogram
    val f = Multimodal.byteHistogramFeatures(spark, assets)
    val row = f.where(col("id") === 0).head().getSeq[Double](1)
    assert(row.length === 16)
    assert(math.abs(row.sum - 1.0) < 0.01)
    // frame sampling plumbing
    val frames = Multimodal.frameSample(spark, assets, stride = 32)
    assert(frames.where(col("id") === 0).count() > 0)
    // long-form histogram (the oracle-checked face): 16 bins/asset, sums ~1
    val hl = Multimodal.byteHistogramLong(spark, assets)
    assert(hl.where(col("id") === 0).count() === 16)
    val s0 = hl.where(col("id") === 0).agg(sum(col("freq"))).head().getDouble(0)
    assert(math.abs(s0 - 1.0) < 0.01)
    // resize kernel: fixed output length, values in byte range, block means
    val rs = Multimodal.resizeBytes(spark, assets, targetLen = 32)
    val r0 = rs.where(col("id") === 0).head()
    assert(r0.getAs[Array[Byte]]("content").length === 32)
    // resized bytes of ASCII text stay within the observed byte range
    val bs = r0.getAs[Array[Byte]]("content").map(_ & 0xff)
    assert(bs.forall(v => v >= 32 && v < 128))
  }

  test("streaming windowedCounts equals the batch result") {
    val dir = sf0
    val batch = Streaming.windowedCounts(Tables.events(spark, dir))
    // stage the events parquet as a streaming source dir first
    Tables.events(spark, dir).write.mode("overwrite").parquet("/tmp/graft-stream-in")
    val schema = Tables.events(spark, dir).schema
    val stream = spark.readStream.schema(schema)
      .parquet("/tmp/graft-stream-in")
    val q = Streaming.windowedCountsStream(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("winout").start()
    try {
      q.processAllAvailable()
      val got = spark.table("winout")
      assert(got.count() === batch.count())
      assert(got.except(batch).count() === 0)
    } finally q.stop()
  }

  test("flatMapGroupsWithState carries per-user state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.{UserEvent, UserTotals}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = graft.operators.Streaming.runningUserTotals(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName("totals").start()
    try {
      in.addData(UserEvent(1L, 1.0), UserEvent(1L, 2.0), UserEvent(2L, 5.0))
      q.processAllAvailable()
      in.addData(UserEvent(1L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("totals").as[UserTotals].collect()
      // batch 1 emitted (1 -> n=2,sum=3), (2 -> n=1,sum=5); batch 2 (1 -> n=3,sum=7)
      assert(rows.exists(r => r.user_id == 1 && r.n_events == 2 && r.sum_value == 3.0))
      assert(rows.exists(r => r.user_id == 1 && r.n_events == 3 && r.sum_value == 7.0))
      assert(rows.exists(r => r.user_id == 2 && r.n_events == 1 && r.sum_value == 5.0))
    } finally q.stop()
  }

  test("incrementalAssign grows the sharded index from a point stream") {
    import java.nio.file.Files
    import graft.operators.Sharding
    val tmp = Files.createTempDirectory("graft-inc").toString
    val pts = Tables.points(spark, sf0)
    val cents = Sharding.fitCentroids(spark, pts, k = 4, iters = 1)
    // batch-build the initial index from the first half
    val first = pts.where(col("id") < 250)
    Sharding.writeSharded(first, Sharding.assign(first, cents), s"$tmp/index")
    // stream the second half in as "new" points
    pts.where(col("id") >= 250).write.parquet(s"$tmp/incoming")
    val stream = spark.readStream.schema(pts.schema).parquet(s"$tmp/incoming")
    val q = graft.operators.Streaming.incrementalAssign(
      stream, cents, s"$tmp/index", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    val index = spark.read.parquet(s"$tmp/index")
    assert(index.count() === pts.count())
    // incrementally-added points landed in the same shard the batch
    // assignment would give them
    val expect = Sharding.assign(pts, cents).select("id", "shard_id")
    val got = index.select(col("id"), col("shard_id").cast("int").as("shard_id"))
    assert(got.except(expect).count() === 0)
  }

  test("winnowing fingerprint: rolling-hash minima, dup-stable, short-doc empty") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (0L, a), (1L, a), // identical docs -> identical fingerprints
      (2L, "tiny"), // shorter than k -> empty fingerprint
      (3L, a + " by the river")).toDF("id", "text")
    val fp = TextStats.winnowingFingerprint(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) === fp(1L) && fp(0L).nonEmpty)
    assert(fp(2L) === "")
    // a suffix edit preserves most winnowed minima (containment property)
    val s0 = fp(0L).split('|').toSet
    val s3 = fp(3L).split('|').toSet
    assert((s0 intersect s3).size.toDouble / s0.size > 0.6)
  }

  test("sessionize: gap splits sessions per user") {
    val e = Streaming.sessionize(Tables.events(spark, sf0))
    // every user has at least one session; session event counts sum to total
    val total = e.agg(sum("n_events")).head().getLong(0)
    assert(total === Tables.events(spark, sf0).count())
    assert(e.where(col("end_ms") < col("start_ms")).count() === 0)
  }

  test("streamingPacker offsets carry across micro-batches == batch per-group packing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.DocTok
    implicit val sc = spark.sqlContext
    val docs = Seq(
      DocTok("s1", 1L, 5), DocTok("s1", 2L, 7), DocTok("s2", 10L, 3),
      DocTok("s1", 3L, 4), DocTok("s2", 11L, 9), DocTok("s2", 12L, 1))
    val in = MemoryStream[DocTok]
    val q = graft.operators.Streaming.streamingPacker(in.toDS())
      .writeStream.format("memory").queryName("spack").outputMode("append").start()
    try {
      in.addData(docs.take(3)); q.processAllAvailable()
      in.addData(docs.drop(3)); q.processAllAvailable()
      val streamed = spark.table("spack")
        .select("grp", "id", "n_tokens", "start_off").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch reference over the SAME rows (ids arrive in order per group)
      import spark.implicits._
      val batchDf = docs.map(d => (d.id, d.grp, Seq.fill(d.n.toInt)("w").mkString(" ")))
        .toDF("id", "grp", "text")
      val batch = graft.operators.Packing.packChunksByGroup(batchDf, 8)
        .select("grp", "id", "n_tokens", "start_off").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming LSH near-dup: cross-batch pairs, state capped per band") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val in = MemoryStream[(Long, String)]
    val q = Streaming.streamingLshCandidates(in.toDF().toDF("id", "text"), maxBandSize = 10)
      .writeStream.outputMode("append").format("memory").queryName("lshcands").start()
    try {
      in.addData((0L, a), (2L, "completely different content about engines"))
      q.processAllAvailable()
      // batch 1: no same-band pairs yet
      val after1 = spark.table("lshcands").count()
      // batch 2: the exact dup of doc 0 arrives — must pair ACROSS batches
      in.addData((3L, a))
      q.processAllAvailable()
      val pairs = spark.table("lshcands")
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 3L)))
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
      assert(after1 === 0L)
    } finally q.stop()
    // batch mode: cap bounds emission for a planted mega-cluster
    val mega = (0L until 50L).map(i => (i, a)).toDF("id", "text")
    val capped = Streaming.streamingLshCandidates(mega, maxBandSize = 5)
    // each of the 4 bands admits at most 5 members -> <= 4 * C(5,2) rows
    assert(capped.count() <= 40L)
  }

  test("streaming LSH saturated band keeps its FIRST cap members") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val in = MemoryStream[(Long, String)]
    val q = Streaming.streamingLshCandidates(in.toDF().toDF("id", "text"), maxBandSize = 3)
      .writeStream.outputMode("append").format("memory").queryName("lshsat").start()
    try {
      // saturate every band with ids 0..2 (identical text -> same bands)
      in.addData((0L, a), (1L, a), (2L, a))
      q.processAllAvailable()
      val before = spark.table("lshsat")
        .select("id_a", "id_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(before === Set((0L, 1L), (0L, 2L), (1L, 2L)))
      // a later arrival must be REFUSED by the saturated band: no new
      // pairs, and the state keeps the first cap members (a stream cannot
      // retract already-emitted pairs, so first-in wins by design)
      in.addData((7L, a))
      q.processAllAvailable()
      val after = spark.table("lshsat")
        .select("id_a", "id_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after === before)
    } finally q.stop()
  }

  test("hashedClassifierScore: hand-computed buckets and weights; empty doc kept") {
    // hash('hi') = (0*257+104)*257+105 mod 1e9+7 = 26833 -> bucket 209,
    // w(209) = (209*2654435761) mod 4097 - 2048 = -513; 'yo' -> bucket 488,
    // w = 752. 'hi yo hi' scores 2*(-513) + 752 = -274 -> dropped;
    // 'yo yo' scores 1504 -> kept; an empty doc scores 0 -> kept.
    val docs = Seq((1L, "hi yo hi"), (2L, "yo yo"), (3L, "")).toDF("id", "text")
    val r = TextStats.hashedClassifierScore(docs).orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r === Array(
      (1L, 3L, -274L, false), (2L, 2L, 1504L, true), (3L, 0L, 0L, true)))
  }

  test("Y4M codec: exact round-trip; spec bytes; frame params tolerated; corrupt rejected") {
    // round-trip identity across the geometry grid (w, h, frame count)
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 7L, 11L)) {
      val (w, h, frames) = Multimodal.syntheticYuv(id)
      val y4m = Multimodal.encodeY4m(w, h, 25, 1, frames)
      val (dw, dh, fn, fd, back) = Multimodal.decodeY4m(y4m)
      assert(dw === w && dh === h && fn === 25 && fd === 1)
      assert(back.length === frames.length, s"frame count mismatch for id=$id")
      for (f <- frames.indices)
        assert(back(f).toSeq === frames(f).toSeq, s"frame $f mismatch for id=$id")
      // format-defined size: textual header + nf * (FRAME\n + 3 planes)
      val hdr = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n"
      assert(y4m.length === hdr.length + frames.length * (6 + 3 * w * h))
      assert(new String(y4m, 0, hdr.length, "US-ASCII") === hdr)
    }
    // frame-level parameters after FRAME are legal Y4M: inject one
    val (w, h, frames) = Multimodal.syntheticYuv(5L)
    val plain = Multimodal.encodeY4m(w, h, 25, 1, frames)
    val hdrLen = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".length
    val withParam = plain.take(hdrLen + 5) ++ " Xfoo".getBytes("US-ASCII") ++
      plain.drop(hdrLen + 5)
    val (_, _, _, _, back2) = Multimodal.decodeY4m(withParam)
    assert(back2.length === frames.length &&
      back2(0).toSeq === frames(0).toSeq)
    // dispatching decoder: real Y4M metadata (w, h, frame count)
    val dec = Multimodal.decodeAsset(Multimodal.Asset(5L, "video/y4m", plain))
    assert(dec.width === w && dec.height === h && dec.channels === frames.length)
    // corrupt payload degrades to the stub instead of failing
    val junk = Array.fill[Byte](64)(42)
    val fake = Multimodal.decodeAsset(Multimodal.Asset(6L, "video/y4m", junk))
    assert(fake === Multimodal.fakeDecode(Multimodal.Asset(6L, "video/y4m", junk)))
    // bad magic, subsampled colourspace, and truncated planes are rejected
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("MPEG4 W2 H2 F25:1\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      val c420 = new String(plain, 0, hdrLen, "US-ASCII").replace("C444", "C420")
      Multimodal.decodeY4m(c420.getBytes("US-ASCII") ++ plain.drop(hdrLen))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m(plain.take(plain.length - 3))
    }
  }
}
