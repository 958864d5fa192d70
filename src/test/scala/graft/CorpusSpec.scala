package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("piiRedact counts and redacts each PII kind; clean docs untouched") {
    val docs = Seq(
      (1L, "mail me at a.b+c@x.example.org and 10.0.0.1 today"),
      (2L, "ssn 123-45-6789 twice 987-65-4321"),
      (3L, "plain words only")).toDF("id", "text")
    val r = Corpus.piiRedact(docs).orderBy("id").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(5))) ===
      Array((1L, 1L, 0L, true), (0L, 0L, 2L, true), (0L, 0L, 0L, false)))
    // redaction literally removes the PII text
    val redacted = Seq((9L, "x 1.2.3.4 y")).toDF("id", "text")
    val hash = Corpus.piiRedact(redacted).select("redacted_md5").as[String].head()
    val expected = Seq((9L, "x <IP> y")).toDF("id", "text")
      .select(md5(col("text"))).as[String].head()
    assert(hash === expected)
  }

  test("normalizeText collapses case, punctuation and whitespace") {
    val docs = Seq(
      (1L, "  Hello,   WORLD!! 42  "),
      (2L, "already clean text")).toDF("id", "text")
    val r = Corpus.normalizeText(docs).orderBy("id").collect()
    val cleanMd5 = Seq((0L, "hello world 42")).toDF("id", "text")
      .select(md5(col("text"))).as[String].head()
    assert(r(0).getString(2) === cleanMd5)
    assert(r(0).getLong(1) === "hello world 42".length.toLong)
    val sameMd5 = Seq((0L, "already clean text")).toDF("id", "text")
      .select(md5(col("text"))).as[String].head()
    assert(r(1).getString(2) === sameMd5)
  }

  test("vocabulary: min-count cutoff, rank order, dense ids") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b d d d d")).toDF("id", "text")
    val v = Corpus.vocabulary(docs, minCount = 2, topN = 2)
      .orderBy("token_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // counts: a=4, d=4, b=3, c=1(cut); top-2 by (cnt desc, tok): a, d
    assert(v === Array(("a", 4L, 0L), ("d", 4L, 1L)))
  }

  test("mixtureSample: quotas never oversample, binding source keeps all") {
    val docs = (0L until 60L).map { i =>
      val src = if (i < 10) "srcA" else if (i < 30) "srcB" else "srcC"
      (i, src)
    }.toDF("id", "source")
    // weights: A=1, B=2, C=3 -> ratios 10/1, 20/2, 30/3 all equal (=10);
    // binding source is lexicographic first (srcA); quotas = weights*10
    val w = when(col("source") === "srcA", 1)
      .when(col("source") === "srcB", 2).otherwise(3)
    val r = Corpus.mixtureSample(docs, w.cast("long"))
    val kept = r.where(col("keep")).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(kept === Map("srcA" -> 10L, "srcB" -> 20L, "srcC" -> 30L))
    // skewed weights: A=3 -> binding is A (10/3); B quota = 1*(10 div 3)*...
    val w2 = when(col("source") === "srcA", 3).otherwise(1).cast("long")
    val kept2 = Corpus.mixtureSample(docs, w2).where(col("keep"))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // binding A: m_cnt=10, m_weight=3; quotas: A=3*10/3=10, B=C=1*10/3=3
    assert(kept2 === Map("srcA" -> 10L, "srcB" -> 3L, "srcC" -> 3L))
    // determinism: same input -> same kept set
    val k1 = r.where(col("keep")).select("id").as[Long].collect().sorted
    val k2 = Corpus.mixtureSample(docs, w.cast("long"))
      .where(col("keep")).select("id").as[Long].collect().sorted
    assert(k1 === k2)
  }

  test("curriculumBuckets equals the single-partition window computation") {
    val rnd = new scala.util.Random(11)
    // heavy ties: scores drawn from only 7 distinct values
    val rows = (0L until 400L).map(i => (i, (rnd.nextInt(7) * 10).toDouble / 100))
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("id", "score").repartition(parts)
      val got = Corpus.curriculumBuckets(df, nBuckets = 10)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      val exp = rows.sortBy { case (id, s) => (s, id) }.zipWithIndex.map {
        case ((id, _), i) => id -> ((i + 1L, i.toLong * 10 / 400))
      }.toMap
      assert(got === exp, s"parts=$parts")
    }
  }

  test("epochShuffle equals the single-partition window deal; seed re-deals") {
    val ids = (0L until 300L).map(i => i * 3 + 1) // sparse, non-contiguous
    for (parts <- Seq(1, 4, 13)) {
      val df = ids.toDF("id").repartition(parts)
      val got = Corpus.epochShuffle(df, seed = "e7", nShards = 4)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      // reference: rank in md5("e7:" || id) order, dealt round-robin
      val hashes = ids.toDF("id")
        .select(col("id"), md5(concat_ws(":", lit("e7"), col("id").cast("string"))))
        .as[(Long, String)].collect().toMap
      val exp = ids.sortBy(i => (hashes(i), i)).zipWithIndex.map {
        case (id, k) => id -> (((k % 4).toInt, k.toLong / 4))
      }.toMap
      assert(got === exp, s"parts=$parts")
    }
    // shards are balanced to within one row, and a different seed deals a
    // different order (the next epoch)
    val a = Corpus.epochShuffle(ids.toDF("id"), "e7", 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val sizes = a.groupBy(_._2).view.mapValues(_.length).values.toSet
    assert(sizes === Set(75))
    val b = Corpus.epochShuffle(ids.toDF("id"), "e8", 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSet !== b.toSet, "a new seed must re-deal the epoch")
    assert(a.map(_._1).sorted === b.map(_._1).sorted, "same corpus either way")
  }

  test("dsirScores: hand-replayed smoothed log-ratio; target-like doc wins") {
    // grams: d1(tgt): "a b","b a","a b"; d2(tgt): "a b","b c";
    //        d3(cand): "a b","b q","q q"; d4(cand): "q q","q q"
    val docs = Seq(
      (1L, "a b a b", "en"), (2L, "a b c", "en"),
      (3L, "a b q q", "de"), (4L, "q q q", "de")).toDF("id", "text", "lang")
    val nB = 512
    val got = Corpus.dsirScores(docs, col("lang") === "en", nB)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // replay: bucket each distinct gram with the operator's md5 formula,
    // then the smoothed ratio arithmetic in plain doubles
    val grams = Seq( // (gram, raw occurrences, target occurrences)
      ("a b", 4L, 3L), ("b a", 1L, 1L), ("b c", 1L, 1L),
      ("b q", 1L, 0L), ("q q", 3L, 0L))
    val bOf = grams.map(_._1).map { g =>
      val h = Seq((g, 0)).toDF("g", "z")
        .select(conv(substring(md5(concat(lit("dsir:"), col("g"))), 1, 8), 16, 10)
          .cast("long") % nB).as[Long].head()
      g -> h
    }.toMap
    // buckets must be collision-free for this fixture or the replay below
    // is wrong by construction
    assert(bOf.values.toSet.size === grams.size)
    val nr = 10.0; val nt = 5.0
    def lr(g: String): Double = {
      val (_, cr, ct) = grams.find(_._1 == g).get
      math.log((ct + 0.5) / (nt + nB * 0.5)) - math.log((cr + 0.5) / (nr + nB * 0.5))
    }
    def rh(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp3 = rh((lr("a b") + lr("b q") + lr("q q")) / 3)
    val exp4 = rh((lr("q q") + lr("q q")) / 2)
    assert(got === Map(3L -> ((3L, exp3)), 4L -> ((2L, exp4))))
    assert(exp3 > exp4, "the doc sharing a target gram must rank higher")
  }

  test("safeSplit: exact dups co-travel; deterministic; slices partition 100") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "alpha beta gamma"), // exact dup of 1 — must share 1's split
      (4L, "eta theta iota"), (5L, "kappa lambda mu")).toDF("id", "text")
    val s1 = Corpus.safeSplit(docs).select("id", "split").as[(Long, String)]
      .collect().toMap
    assert(s1(1L) === s1(3L), "exact dups must land in the same split")
    // deterministic across invocations and row order
    val s2 = Corpus.safeSplit(docs.orderBy(desc("id")))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s1 === s2)
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    // boundary contract on the bucket space itself: 80/10/10
    val buckets = (0 until 100).map { b =>
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    assert(buckets.count(_ == "train") === 80)
    assert(buckets.count(_ == "val") === 10)
    assert(buckets.count(_ == "test") === 10)
    intercept[IllegalArgumentException](Corpus.safeSplit(docs, 95, 5))
  }

  test("boilerplateClean drops high-df chunks and reassembles in order") {
    val header = (1 to 10).map(i => s"h$i").mkString(" ")
    val docs = Seq(
      (1L, "s", s"$header one two three"),
      (2L, "s", s"$header four five"),
      (3L, "s", s"$header six"),
      (4L, "s", "unique words only here")).toDF("id", "source", "text")
    val r = Corpus.boilerplateClean(docs, chunkWords = 10, dfThreshold = 3)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    def m(s: String) = Seq((0L, s)).toDF("id", "t").select(md5(col("t")))
      .as[String].head()
    // header chunk df=3 >= 3 -> dropped; tail chunks survive
    assert(r(0) === ((1L, 2L, 1L, m("one two three"))))
    assert(r(1) === ((2L, 2L, 1L, m("four five"))))
    assert(r(2) === ((3L, 2L, 1L, m("six"))))
    assert(r(3) === ((4L, 1L, 1L, m("unique words only here"))))
  }

  test("boilerplateClean: doc with every chunk dropped hashes empty string") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "s", ten), (2L, "s", ten), (3L, "s", ten)).toDF("id", "source", "text")
    val r = Corpus.boilerplateClean(docs, chunkWords = 10, dfThreshold = 3)
      .orderBy("id").collect()
    def m(s: String) = Seq((0L, s)).toDF("id", "t").select(md5(col("t")))
      .as[String].head()
    assert(r.forall(x => x.getLong(2) === 0L && x.getString(3) === m("")))
  }

  test("boilerplate df is per-source: same chunk in another source survives") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "s1", ten), (2L, "s1", ten), (3L, "s1", ten),
      (4L, "s2", ten)).toDF("id", "source", "text")
    val r = Corpus.boilerplateClean(docs, chunkWords = 10, dfThreshold = 3)
      .where(col("id") === 4L).collect()(0)
    assert(r.getLong(2) === 1L) // kept in s2 (df=1 there)
  }

  test("bpeTrain: hand-replayed rounds incl. overlapping runs and tie-breaks") {
    import spark.implicits._
    // 'aaaa' x3 exercises the overlap case: greedy left-to-right (a,a)
    // merge must yield (aa)(aa), not (aa)a a — the padded 5-pass replace
    // semantics the oracle also replays
    val docs = Seq((1L, "aaaa aaaa ab"), (2L, "aaaa")).toDF("id", "text")
    val got = Corpus.bpeTrain(docs, numMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: (a,a) weighted 3 words x 3 adjacent pairs = 9
    assert(got(0) === ((1, "a", "a", "aa", 9L)))
    // round 2: 'aa aa </w>' gives (aa,aa)=3 and (aa,</w>)=3 — the tie
    // breaks on the "l r" string, '<' < 'a', so (aa,</w>) wins
    assert(got(1) === ((2, "aa", "</w>", "aa</w>", 3L)))
  }

  test("bpeEncode: hand-applied rules, position order, empty doc") {
    import spark.implicits._
    // rules learned by the bpeTrain test above on the same corpus:
    // 'aaaa' -> 'a a a a </w>' -> (a,a) leftmost non-overlapping ->
    // 'aa aa </w>' -> (aa,</w>) -> 'aa aa</w>' (2 tokens);
    // 'ab' -> 'a b </w>' untouched (3 tokens)
    val docs = Seq((1L, "aaaa aaaa ab"), (2L, "aaaa"), (3L, "")).toDF("id", "text")
    val r = Corpus.bpeEncode(docs, Seq(("a", "a"), ("aa", "</w>")))
      .orderBy("id").collect()
    def m(s: String) =
      Seq(Tuple1(s)).toDF("t").select(md5(col("t"))).as[String].head()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getString(2))) === Array(
      (1L, 7L, m("aa aa</w> aa aa</w> a b </w>")),
      (2L, 2L, m("aa aa</w>")),
      (3L, 0L, m(""))))
  }

  test("tokenBudgetPlan: hand-computed targets, epoch cap, shortfall") {
    import spark.implicits._
    // weights (suffix % 3 + 1): src1 -> 2, src2 -> 3, src3 -> 1
    // tokens: 10 / 5 / 25; tot = 40, tot_w = 6, budget = 40*300 DIV 100 = 120
    val docs = Seq(
      (1L, "src1", Seq.fill(10)("w").mkString(" ")),
      (2L, "src2", Seq.fill(5)("w").mkString(" ")),
      (3L, "src3", Seq.fill(25)("w").mkString(" "))).toDF("id", "source", "text")
    val r = Corpus.tokenBudgetPlan(docs,
      weight = substring(col("source"), 4, 10).cast("long") % 3 + 1)
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))
    assert(r === Array(
      // src1: target 120*2/6 = 40 -> 4 epochs exactly fills it
      ("src1", 10L, 2L, 40L, 4L, 40L, 0L),
      // src2: target 60 wants 12 epochs; cap 4 allocates 20, shortfall 40
      ("src2", 5L, 3L, 60L, 4L, 20L, 40L),
      // src3: target 20 fits inside one pass over 25 tokens
      ("src3", 25L, 1L, 20L, 1L, 20L, 0L)))
  }

  test("chunkWindows: overlap grid, short tail, single chunk, empty doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), // n=6: starts 0,2,4 -> abc, cde, ef
      (2L, "x y"),         // n=2 <= size: one chunk
      (3L, "")             // one empty chunk
    ).toDF("id", "text")
    val r = Corpus.chunkWindows(docs, chunkSize = 3, stride = 2)
      .orderBy("id", "chunk_idx").collect()
    def m(s: String) =
      Seq(Tuple1(s)).toDF("t").select(md5(col("t"))).as[String].head()
    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getString(3))) === Array(
      (1L, 0, 3L, m("a b c")),
      (1L, 1, 3L, m("c d e")),
      (1L, 2, 2L, m("e f")),
      (2L, 0, 2L, m("x y")),
      (3L, 0, 0L, m(""))))
    // every token covered: union of chunks at stride=chunkSize partitions
    val cover = Corpus.chunkWindows(docs, chunkSize = 2, stride = 2)
      .agg(sum(col("n_chunk_tokens"))).as[Long].head()
    assert(cover === 8L) // 6 + 2 + 0
  }
}
