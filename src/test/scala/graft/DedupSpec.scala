package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 0
    (2L, "completely different content about spark distributed query engines today"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank") // exact dup of 0
  ).toDF("id", "text")

  test("shingles: distinct word 3-grams, short texts empty") {
    val sh = docs.select(col("id"), Dedup.shingles(col("text")).as("sh"))
    assert(sh.where(col("id") === 0).head().getSeq[String](1).head === "the quick brown")
    val short = Seq((9L, "two words")).toDF("id", "text")
    assert(short.select(Dedup.shingles(col("text"))).head().getSeq[String](0).isEmpty)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup always caught
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated never
    val j03 = Dedup.minhashNearDups(docs, 0.5)
      .where(col("id_a") === 0 && col("id_b") === 3).head().getDouble(2)
    assert(j03 === 1.0)
  }

  test("incremental near-dup: batch vs stored band index equals the full run's cross pairs") {
    // the stored index over the existing corpus (no hot bands here, so
    // the build-time cap is a no-op and full-run equality is exact)
    val refBands = Dedup.minhashBandsLong(docs).localCheckpoint()
    val incoming = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"), // dup of 0/3
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"), // near-dup (one appended word)
      (102L, "entirely new material with no overlap whatsoever in any shingle")
    ).toDF("id", "text")
    val inc = Dedup.minhashNearDupsIncremental(refBands, docs, incoming,
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference replay: the FULL minhashNearDups over corpus ∪ batch,
    // restricted to (incoming, reference) cross pairs
    val full = Dedup.minhashNearDups(docs.unionByName(incoming), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => p._2 >= 100L && p._1 < 100L)
      .map(p => (p._2, p._1, p._3)).toSet
    assert(inc === full)
    // planted recall + precision: the exact dup and near-dup hit, the
    // unrelated doc never appears
    assert(inc.exists(p => p._1 == 100L && p._2 == 0L && p._3 == 1.0))
    assert(inc.exists(p => p._1 == 101L && p._2 == 0L))
    assert(!inc.exists(_._1 == 102L))
    // batch-internal pairs (100 vs 101) are deliberately NOT emitted —
    // that is the batch's own minhashNearDups run
    assert(inc.forall(p => p._1 >= 100L && p._2 < 100L))
  }

  test("simhash: identical texts share fingerprints; hamming of dup is 0") {
    val sh = Dedup.simhash32(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh(0L).length === 32 && sh(0L).forall(c => c == '0' || c == '1'))
    assert(sh(0L) === sh(3L))
    assert(sh(0L) !== sh(2L))
    val h = docs.limit(1).select(
      Dedup.hammingBits(lit(sh(0L)), lit(sh(1L))).as("h")).head().getInt(0)
    assert(h >= 0 && h <= 8) // near-dup stays close in hamming space
  }

  test("simhash32 expression is byte-identical to the relational form") {
    // edge cases the kernel must match: duplicate tokens (counted per
    // occurrence), single token, empty text (split -> [""]), and ties
    val tricky = Seq(
      (10L, "a a a b"), (11L, "x"), (12L, ""), (13L, "a b"),
      (14L, "the the quick quick brown brown fox fox over over")
    ).toDF("id", "text")
    val all = docs.unionByName(tricky)
    val expr = Dedup.simhash32(all).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rel = Dedup.simhash32Relational(all).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(expr.keySet === rel.keySet)
    expr.keySet.foreach(k => assert(expr(k) === rel(k), s"mismatch at id=$k"))
    // null text: relational explode drops the doc; expression must too
    val withNull = Seq((20L, null.asInstanceOf[String])).toDF("id", "text")
    assert(Dedup.simhash32(withNull).count() === 0L)
  }

  test("ngram jaccard: dup pair scores 1.0 within block") {
    val blocked = docs.withColumn("block", lit("b"))
    val res = Dedup.ngramJaccardPairs(blocked, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(res((0L, 3L)) === 1.0)
  }

  test("simhash near-dups via multi-index hamming banding") {
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 3L)) === 0) // exact dup: hamming 0, always found
    assert(!pairs.keySet.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated absent
    // pigeonhole completeness: every pair within hamming 3 is found
    val sh = Dedup.simhash32(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for {
      a <- sh.keys; b <- sh.keys if a < b
      h = sh(a).zip(sh(b)).count { case (x, y) => x != y } if h <= 3
    } assert(pairs.contains((a, b)), s"missed pair ($a,$b) at hamming $h")
  }

  test("hot-band cap drops a planted mega-band but still finds true near-dups") {
    // 300 identical docs => every one of their bands has 300 members =>
    // 4 * 300^2/2 ≈ 180k candidate pairs without the cap. With the cap the
    // mega-band is dropped (exact dedup's job) and the candidate count
    // collapses, while the distinct near-dup pair is still found.
    val mega = (100L until 400L).map(i =>
      (i, "all these documents share exactly the same repeated text body here"))
    val all = docs.unionByName(mega.toDF("id", "text"))
    val banded = Dedup.minhashBandsLong(all).localCheckpoint()
    val uncapped = Dedup.candidatesFromBands(banded)
    val capped = Dedup.candidatesFromBands(banded, maxBandSize = 50)
    assert(uncapped.count() > 40000L) // quadratic blowup is real
    assert(capped.count() < 100L) // cap collapses it
    val pairs = Dedup.jaccardVerify(all, capped)
      .where(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 3L))) // true dups survive
  }

  test("gram df-cap keeps jaccard exact while capping hot grams") {
    val blocked = docs.withColumn("block", lit("b"))
    // maxDf=2: grams in 3+ docs (the shared "the quick brown..." grams of
    // docs 0/1/3) become hot; candidates must come from cold grams, but the
    // reported jaccard still counts hot grams (exactness patch).
    val capped = Dedup.ngramJaccardPairs(blocked, threshold = 0.9, maxDf = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val uncapped = Dedup.ngramJaccardPairs(blocked, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the exact-dup pair (0,3) shares ONLY grams with df=2 (docs 0,3) or
    // df=3 (shared with 1); its cold grams (df<=2) make it a candidate and
    // its jaccard must be EXACTLY the uncapped 1.0
    assert(capped.get((0L, 3L)) === uncapped.get((0L, 3L)))
  }

  test("nearDupClusters: keeper is the component minimum, chains converge") {
    // chain 1-2-3, clique 10-11-12, pair (20,21), long chain 100..110
    val chain = (100L until 110L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)) ++ chain).toDF("id_a", "id_b")
    val r = Dedup.dedupReport(pairs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    Seq(1L, 2L, 3L).foreach(i => assert(r(i) === ((1L, 3L))))
    Seq(10L, 11L, 12L).foreach(i => assert(r(i) === ((10L, 3L))))
    Seq(20L, 21L).foreach(i => assert(r(i) === ((20L, 2L))))
    (100L to 110L).foreach(i => assert(r(i) === ((100L, 11L))))
  }

  test("nearDupClusters: 500-node chain converges in O(log d) rounds") {
    import spark.implicits._
    // a worst-case long-chain component; plain per-hop propagation would
    // need ~500 rounds — pointer jumping must land it well under 15
    val pairs = (0L until 500L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val r = Dedup.nearDupClusters(pairs, maxIters = 15).collect()
    assert(r.length === 501)
    assert(r.forall(_.getLong(1) === 0L))
  }

  test("lshIndexAppend ≡ rebuild over the union: bands + banned byte-equal, every cap transition covered") {
    // identical texts share ALL bands, so copy-count = band size exactly:
    //  - family A: 3 corpus copies (= cap, retained at build) + 1 batch
    //    copy -> pushed OVER the cap by the append (stored rows must drop)
    //  - family B: 4 corpus copies (> cap, banned at build, n=4) + 1
    //    batch copy -> stays banned, sidecar n must update to 5
    //  - family C: 1 corpus doc + 1 batch near-dup -> plain retained rows
    //  - plus an untouched unique corpus doc (rows pass through verbatim)
    val famA = "alpha beta gamma delta epsilon zeta eta theta"
    val famB = "one two three four five six seven eight nine"
    val cap = 3
    val corpus = Seq(
      (10L, famA), (11L, famA), (12L, famA),
      (20L, famB), (21L, famB), (22L, famB), (23L, famB),
      (30L, "the quick brown fox jumps over the lazy dog"),
      (40L, "totally untouched unique document text here okay")
    ).toDF("id", "text")
    val batch = Seq(
      (110L, famA),
      (120L, famB),
      (130L, "the quick brown fox jumps over the lazy cat")
    ).toDF("id", "text")
    val built = Dedup.lshIndexBuild(corpus, threshold = cap)
    val appended = Dedup.lshIndexAppend(built, batch, threshold = cap)
    val rebuilt = Dedup.lshIndexBuild(corpus.unionByName(batch), threshold = cap)
    def bandSet(ix: Dedup.LshIndex) =
      ix.bands.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    def bannedSet(ix: Dedup.LshIndex) =
      ix.banned.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(bandSet(appended) === bandSet(rebuilt))
    assert(bannedSet(appended) === bannedSet(rebuilt))
    // the transitions actually happened: famA's build-retained rows are
    // gone post-append, famB's sidecar n grew 4 -> 5, famC rows present
    assert(bandSet(built).exists(_._1 == 10L) &&
      !bandSet(appended).exists(_._1 == 10L))
    val bN = bannedSet(appended).map(_._2)
    assert(bN.contains(4L) && bN.contains(5L)) // famA now 4, famB now 5
    assert(bandSet(appended).exists(_._1 == 130L))
    assert(bandSet(appended).filter(_._1 == 40L) ===
      bandSet(built).filter(_._1 == 40L))
    // and the grown index probes like the rebuilt one: a later batch's
    // candidates against either are identical
    val b2 = Seq((200L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val ref = corpus.unionByName(batch)
    def probe(ix: Dedup.LshIndex) =
      Dedup.minhashNearDupsIncremental(ix.bands, ref, b2, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probe(appended) === probe(rebuilt))
    assert(probe(appended).exists(_._2 == 130L)) // sees the FOLDED batch doc
  }

  test("nearDupClustersTracked: cleanup frees every block the call persisted") {
    import spark.implicits._
    val sc = spark.sparkContext
    val pairs = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = sc.getPersistentRDDs.keySet
    val tracked = Dedup.nearDupClustersTracked(pairs)
    // the result is usable while tracked...
    assert(tracked.df.count() === 51L)
    // ...the backing blocks are among the persisted set...
    assert(tracked.backingRddIds.nonEmpty)
    assert(tracked.backingRddIds.forall(sc.getPersistentRDDs.keySet.contains))
    tracked.cleanup()
    // ...and after cleanup the session holds NO persisted RDD this call
    // created (intermediate rounds were already freed inside the call)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("semantic near-dups: planted copy lands in the same cluster, cosine 1.0") {
    val pts = Tables.points(spark, sf0)
    val cents = graft.operators.Sharding.fitCentroids(spark, pts, k = 4, iters = 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val planted = pts.unionByName(
      pts.where(col("id") === 7).select(lit(100007L).as("id"), col("vec")))
    val res = Dedup.semanticNearDups(planted, cents, threshold = 0.99).collect()
    assert(res.exists(r => r.getLong(0) == 7L && r.getLong(1) == 100007L
      && r.getDouble(3) == 1.0))
    // every reported pair really shares a cluster: recompute each side's
    // assignment independently and compare to the pair's shard_id
    val asg = graft.operators.Sharding.assignLit(planted, cents)
      .select(col("id"), col("shard_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (r <- res) {
      val s = r.getInt(2)
      assert(asg(r.getLong(0)) === s && asg(r.getLong(1)) === s,
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) not co-clustered")
    }
  }

  test("fuzzyWordPairs: deletion banding finds EVERY distance-<=1 pair") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(3)
    // long words (> FuzzyPrefixLen=7 chars) exercise the prefix-restricted
    // keys: edits BEYOND the prefix (shared 0-deletion key), edits INSIDE
    // it, and length-changing edits at both ends must all still pair
    val longs = Seq(
      "abcdefghijk", "abcdefghiak", // substitution past the prefix
      "abcdefghijkz",               // append (edit past prefix)
      "aacdefghijk",                // substitution inside the prefix
      "bcdefghijk",                 // deletion at position 1
      "azbcdefghijk",               // insertion inside the prefix
      "abcdefgh")                   // unrelated long (dist > 1 from above)
    val words = (Seq("cat", "cut", "cart", "ca", "dog", "dogs", "dig", "xyz") ++
      longs ++
      (1 to 40).map(_ => (1 + rnd.nextInt(5) to 5).map(_ =>
        ('a' + rnd.nextInt(3)).toChar).mkString) ++
      (1 to 20).map(_ => (1 to 8 + rnd.nextInt(4)).map(_ =>
        ('a' + rnd.nextInt(3)).toChar).mkString)).distinct
    val docs = Seq((1L, words.mkString(" "))).toDF("id", "text")
    val got = Dedup.fuzzyWordPairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = (for {
      a <- words; b <- words if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got === expected)
  }

  test("dupSpans: winnowing guarantee, span merge, identical docs, unique doc") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over it" // 33 chars >= k+w-1
    val same = "this exact document repeats verbatim in the corpus twice over"
    val docs = Seq(
      (1L, s"AAAA $shared BBBBBBBB"),
      (2L, s"CCCCCCCCCC $shared DD"),
      (3L, "totally unique text with no twin anywhere at all"),
      (4L, same),
      (5L, same)).toDF("id", "text")
    val r = Dedup.dupSpans(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))))
      .toMap
    // the winnowing guarantee: a shared run of >= k+w-1 chars always
    // shares at least one anchor -> docs 1/2 must report a dup span
    // bounded by the shared region's length
    for (id <- Seq(1L, 2L)) {
      val (na, ns, dc, frac) = r(id)
      assert(na >= 1L && ns >= 1L, s"doc $id missed the planted shared run")
      // the true shared run includes the flanking spaces both docs have
      assert(dc >= 8L && dc <= shared.length.toLong + 2, s"doc $id dup_chars=$dc")
      assert(frac > 0.0 && frac < 1.0)
    }
    // a doc with no cross-doc twin reports zeros
    assert(r(3L) === ((0L, 0L, 0L, 0.0)))
    // identical docs: anchors tile the whole text (consecutive winnowed
    // starts are <= w apart < k, so spans all merge into ONE) and cover
    // all but the < w-char head and tail slack
    for (id <- Seq(4L, 5L)) {
      val (_, ns, dc, frac) = r(id)
      assert(ns === 1L, s"doc $id spans did not merge: $ns")
      assert(dc >= same.length.toLong - 6 && frac > 0.85, s"doc $id dc=$dc frac=$frac")
    }
  }

  test("spanDedup: keeper semantics, within-doc repeats, empty doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // segs (W=2): "a b", "c d" — both global firsts
      (2L, "a b x"),     // "a b" loses to doc1; tail "x" unique
      (3L, "c d c d"),   // both segs lose to doc1's "c d" (in-doc repeat counted)
      (4L, "")).toDF("id", "text")
    val r = Dedup.spanDedup(docs, segTokens = 2).orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getString(5), x.getDouble(6)))
    def m(s: String) =
      Seq(Tuple1(s)).toDF("t").select(md5(col("t"))).as[String].head()
    assert(r === Array(
      (1L, 2L, 0L, 4L, 4L, m("a b c d"), 1.0),
      (2L, 2L, 1L, 3L, 1L, m("x"), 0.3333),
      (3L, 2L, 2L, 4L, 0L, m(""), 0.0),
      (4L, 0L, 0L, 0L, 0L, m(""), 1.0)))
  }

  test("crossSplitLeakage: only straddling near-dup pairs survive") {
    import spark.implicits._
    // (id * 2654435761) % 100 = id * 61 % 100: 1 -> 61 (train),
    // 2 -> 22 (train), 13 -> 93 (val) at trainPct = 90
    val t = "the quick brown fox jumps over the lazy dog near a river bank"
    val docs = Seq((1L, t), (2L, t), (13L, t)).toDF("id", "text")
    val r = Dedup.crossSplitLeakage(docs, threshold = 0.8)
      .orderBy("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getString(3), x.getString(4)))
    // (1,2) is train-train and must be filtered; both pairs with 13 cross
    assert(r === Array(
      (1L, 13L, 1.0, "train", "val"),
      (2L, 13L, 1.0, "train", "val")))
  }

  test("embedding near-dups: planted copy found with cosine 1.0") {
    val pts = Tables.points(spark, sf0)
    val planted = pts.unionByName(
      pts.where(col("id") === 7).select(lit(100007L).as("id"), col("vec")))
    val res = Dedup.embeddingNearDups(planted, threshold = 0.99)
    val hits = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.exists(h => h._1 == 7L && h._2 == 100007L && h._3 == 1.0))
  }

  test("softDedupKeys: n_copies from exact-text groups; ln(u)·c replayed") {
    val got = Dedup.softDedupKeys(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // docs 0 and 3 share a text (n_copies 2); 1 and 2 are unique
    assert(got.view.mapValues(_._1).toMap ===
      Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
    // replay the key arithmetic: u from the md5 hex prefix, times n_copies
    def key(id: Long, c: Long): Double = {
      val hex = Seq((id, 0)).toDF("id", "z")
        .select(substring(md5(concat(lit("sdsamp:"), col("id").cast("string"))), 1, 8))
        .as[String].head()
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      BigDecimal(math.log(u) * c)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (id, (c, k)) => assert(k === key(id, c), s"id=$id") }
    // the weight contract: a copy's key is its unique-weight key DOUBLED
    // (more negative), so each dup group competes as one doc in the top-k
    assert(got(0L)._2 < key(0L, 1L))
  }
}
