package graft

import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** SuffixArray.build — distributed prefix doubling. Pins the classic
  * hand-checkable case, the multi-doc concatenation with prefix-of-prefix
  * ties (shorter suffix sorts first), and a brute-force comparison on a
  * small-alphabet string long enough to force many doubling rounds. */
class SuffixArraySpec extends SparkSpec {

  private def ranks(docs: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    SuffixArray.build(docs.toDF("id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference ranks: sort the actual suffix strings. */
  private def brute(corpus: String): Map[Long, Long] =
    corpus.indices.map(i => corpus.substring(i))
      .zipWithIndex.sortBy(_._1).zipWithIndex
      .map { case ((_, pos), rank) => pos.toLong -> rank.toLong }.toMap

  test("banana") {
    val got = ranks(Seq((0L, "banana")))
    assert(got === brute("banana\u0001"))
    // spot-check the canonical order: terminator first, then a-suffixes
    assert(got(6L) === 0L && got(5L) === 1L && got(3L) === 2L &&
      got(1L) === 3L && got(0L) === 4L && got(4L) === 5L && got(2L) === 6L)
  }

  test("multi-doc concat; a prefix suffix sorts before its extension") {
    // corpus = ab<T>ab<T> (T = the \u0001 terminator): the suffix at 3
    // (ab<T>) is a strict prefix of the one at 0 — shorter sorts first
    val got = ranks(Seq((0L, "ab"), (1L, "ab")))
    assert(got === brute("ab\u0001ab\u0001"))
    assert(got(3L) < got(0L) && got(5L) === 0L)
  }

  test("brute-force parity on a repetitive small-alphabet corpus") {
    // 3-letter alphabet, 400 chars: long common prefixes force the
    // doubling past several rounds before ranks separate
    val rnd = new scala.util.Random(7)
    val texts = Seq.tabulate(5)(d =>
      (d.toLong, Seq.fill(80)("abc" (rnd.nextInt(3))).mkString))
    val corpus = texts.map(_._2).map(_ + "\u0001").mkString
    assert(ranks(texts) === brute(corpus))
  }

  test("empty doc contributes exactly its terminator") {
    val got = ranks(Seq((0L, ""), (1L, "ba")))
    assert(got === brute("\u0001ba\u0001"))
  }

  test("packed init: packed build = unpacked buildFull = brute force; guards fall back") {
    import spark.implicits._
    // ASCII corpus with a SHORT doc (clamps mPack to min-doc-len + 2, so
    // the cross-terminator tail still fits ONE next doc) and long repeats
    // (ties must survive into the doubling rounds either way)
    val texts = Seq(0L -> "abracadabra abracadabra", 1L -> "abr",
      2L -> "cadabra abracadabra!")
    val docs = texts.toDF("id", "text")
    val corpus = texts.map(_._2).map(_ + "\u0001").mkString
    val packed = SuffixArray.build(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed === brute(corpus))
    // buildFull never packs (history(k) = rank of first 2^k chars is its
    // contract) — its final sa must equal the packed build's exactly
    val idx = SuffixArray.buildFull(docs)
    val unpacked = idx.sa.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    idx.unpersist()
    assert(packed === unpacked)
    // non-ASCII corpus: the octet-length guard falls back to per-char init
    val nonAscii = Seq(0L -> "h\u00e9llo w\u00f6rld h\u00e9llo", 1L -> "w\u00f6rld w\u00f6rld")
    val corpus2 = nonAscii.map(_._2).map(_ + "\u0001").mkString
    assert(ranks(nonAscii) === brute(corpus2))
    // chr(0) inside a doc: the NUL guard falls back (the packed past-end
    // pad is 0 and would alias a real chr(0))
    val withNul = Seq(0L -> "ab\u0000ab", 1L -> "ab\u0000")
    assert(ranks(withNul) === brute("ab\u0000ab\u0001ab\u0000\u0001"))
  }

  // ---- LCP descent + exact duplicate spans -------------------------------

  /** Reference adjacent-LCPs: sort the actual suffixes, compare
    * neighbours character by character. Map: rank t -> lcp. */
  private def bruteLcp(corpus: String): Map[Long, Long] = {
    val order = corpus.indices.map(i => corpus.substring(i)).zipWithIndex
      .sortBy(_._1).map(_._2)
    (1 until order.length).map { t =>
      val (a, b) = (corpus.substring(order(t)), corpus.substring(order(t - 1)))
      t.toLong -> a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    }.toMap
  }

  private def lcps(docs: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    SuffixArray.lcpAdjacent(SuffixArray.buildFull(docs.toDF("id", "text")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
  }

  test("lcpAdjacent: brute-force parity, incl. the repetitive corpus") {
    // banana: the classic LCP array (hand-checkable)
    assert(lcps(Seq((0L, "banana"))) === bruteLcp("banana\u0001"))
    // multi-doc: the shared "ab\u0001" prefix CROSSES a terminator -- the
    // raw LCP sees through it (duplicateSpans is what clips)
    assert(lcps(Seq((0L, "ab"), (1L, "ab"))) === bruteLcp("ab\u0001ab\u0001"))
    // the repetitive small-alphabet corpus: long LCPs force the descent
    // through several advancing rounds
    val rnd = new scala.util.Random(7)
    val texts = Seq.tabulate(5)(d =>
      (d.toLong, Seq.fill(80)("abc" (rnd.nextInt(3))).mkString))
    val corpus = texts.map(_._2).map(_ + "\u0001").mkString
    assert(lcps(texts) === bruteLcp(corpus))
  }

  test("lcpDescent round cap: capped descent agrees with the full one up to the cap") {
    import spark.implicits._
    // repetitive corpus: adjacent LCPs well past the caps under test
    val rnd = new scala.util.Random(13)
    val texts = Seq.tabulate(3)(d =>
      (d.toLong, Seq.fill(70)("ab" (rnd.nextInt(2))).mkString))
    val idx = SuffixArray.buildFull(texts.toDF("id", "text"))
    val pairSet = SuffixArray.adjacentPairs(idx)
    val full = SuffixArray.lcpDescent(idx, pairSet)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (cap <- Seq(1L, 7L, 16L, 100L)) {
      val capped = SuffixArray.lcpDescent(idx, pairSet, maxNeededLcp = Some(cap))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(capped.keySet === full.keySet)
      capped.foreach { case (t, l) =>
        // the contract: min(l, cap) == min(full, cap) — a consumer that
        // clips at cap cannot tell the runs apart
        assert(math.min(l, cap) === math.min(full(t), cap),
          s"rank $t: capped=$l full=${full(t)} cap=$cap")
        // and the capped value never exceeds what its allowed steps can
        // count (2^(K+1)-1), nor undershoots a full lcp below the cap
        if (full(t) <= cap) assert(l === full(t))
      }
    }
    // empty pair set: early-exit returns an empty frame with the lcp col
    val empty = SuffixArray.lcpDescent(idx, pairSet.where(lit(false)))
    assert(empty.columns.toSeq === Seq("rank", "pos_a", "pos_b", "lcp"))
    assert(empty.count() === 0L)
    idx.unpersist()
  }

  test("group-start labels: each round's label = rows with strictly smaller truncated suffix") {
    import spark.implicits._
    // repetitive 2-letter corpus: groups survive many rounds, so the
    // group-start (Larsson–Sadakane) labeling is exercised well past the
    // first refining round, with converged rows frozen along the way
    val rnd = new scala.util.Random(3)
    val texts = Seq.tabulate(4)(d =>
      (d.toLong, Seq.fill(50)("ab" (rnd.nextInt(2))).mkString))
    val corpus = texts.map(_._2).map(_ + "\u0001").mkString
    val idx = SuffixArray.buildFull(texts.toDF("id", "text"))
    val positions = corpus.indices.map(_.toLong)
    idx.history.zipWithIndex.foreach { case (h, k) =>
      val lab = h.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every round is a COMPLETE labeling (frozen ∪ active)
      assert(lab.keySet === positions.toSet, s"round $k not a full labeling")
      val width = 1L << k
      val trunc = positions.map(p => p -> corpus.substring(p.toInt,
        math.min(corpus.length.toLong, p + width).toInt)).toMap
      // equality semantics the LCP descent relies on: equal label ⇔ equal
      // 2^k-truncated suffix (a strict prefix never ties its extension)
      // ... and from round 1 on, the exact group-start value: rows in
      // strictly smaller truncated-suffix groups (round 0 is the raw code
      // point, order-consistent but not a row count)
      for (p <- positions) {
        val smaller = positions.count(q => trunc(q) < trunc(p))
        if (k > 0) assert(lab(p) === smaller,
          s"round $k pos $p: label ${lab(p)} != group start $smaller")
        positions.foreach { q =>
          assert((lab(p) == lab(q)) === (trunc(p) == trunc(q)),
            s"round $k: label equality diverges from prefix equality at ($p,$q)")
        }
      }
    }
    idx.unpersist()
  }

  test("buildFull history sink: the parquet-spilled index equals the pinned one") {
    import spark.implicits._
    // repetitive 2-letter corpus: several doubling rounds, real LCP work
    val rnd = new scala.util.Random(11)
    val texts = Seq.tabulate(4)(d =>
      (d.toLong, Seq.fill(60)("ab" (rnd.nextInt(2))).mkString))
    val docs = texts.toDF("id", "text")
    val mem = SuffixArray.buildFull(docs)
    // RETENTION: nothing the spilled build pins may OUTLIVE it. Asserting
    // on global pin COUNTS flaked twice (r9, r10): dropCheckpoint
    // unpersists ASYNC (blocking=false — the build must not stall on
    // block cleanup), so counts taken while ANY build's drops are still
    // in flight — including the pinned `mem` build's own per-round drops
    // above — make both the baseline and the settled value racy. Assert
    // on the exact RDD-ID SET instead: ids are unique per context, so
    // "no id pinned after the spilled build that wasn't pinned before it"
    // is immune to pre-existing drops landing mid-poll.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val tmp = java.nio.file.Files.createTempDirectory("graft_saidx").toString
    val spilled = SuffixArray.buildFull(docs, sink = Some(tmp))
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (leaked.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(leaked.isEmpty,
      s"spilled build retained checkpoint RDDs ${leaked.mkString(",")} " +
        "past the async-drop settle window")
    assert(spilled.n === mem.n)
    assert(spilled.history.size === mem.history.size)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(spilled.sa) === pairs(mem.sa))
    spilled.history.zip(mem.history).zipWithIndex.foreach { case ((s, m), k) =>
      assert(pairs(s) === pairs(m), s"history round $k differs")
    }
    // and the LCP consumer over the spilled index matches the pinned path
    def spans(idx: SuffixArray.SaIndex) =
      SuffixArray.duplicateSpansFrom(idx, docs, minLen = 11).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
    assert(spans(spilled) === spans(mem))
    mem.unpersist()
  }

  test("duplicateSpans: planted run found at exact offsets; spans verbatim and clipped") {
    import spark.implicits._
    // the 26-char needle sits at offset 6 of doc 0 and offset 3 of doc 2;
    // everything else is distinct filler
    val needle = "the quick brown fox jumped"
    val texts = Map(0L -> ("xxxxxx" + needle + "yyyy"),
      1L -> "completely unrelated content here",
      2L -> ("zzz" + needle + "wwwwww"))
    val docs = texts.toSeq.sortBy(_._1).toDF("id", "text")
    val spans = SuffixArray.duplicateSpans(docs, minLen = 11).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // suffixes of the needle also clear minLen (offsets advance in step,
    // lengths shrink by 1) -- the FULL needle pair must be the max span
    val (da, oa, db, ob, len) = spans.maxBy(_._5)
    assert(len === needle.length.toLong)
    assert(Set(da, db) === Set(0L, 2L))
    val offOf = Map(0L -> 6L, 2L -> 3L)
    assert(oa === offOf(da) && ob === offOf(db))
    // every reported span stays within-doc (the terminator clip) and is
    // genuinely verbatim
    spans.foreach { case (a, o1, b, o2, l) =>
      assert(l <= texts(a).length - o1 && l <= texts(b).length - o2)
      assert(texts(a).substring(o1.toInt, (o1 + l).toInt) ===
        texts(b).substring(o2.toInt, (o2 + l).toInt))
    }
  }

  test("duplicateSpans deep path: window probe equals the forced descent on >= W-char duplicates") {
    import spark.implicits._
    // long shared runs (saturate the W=64 window) in several shapes:
    // cross-doc, within-doc repeat, identical twins (clip at doc length),
    // and a shared-prefix pair of different lengths (dist_a != dist_b)
    val needle = ("qwertyuiop" * 12).take(110)
    val texts = Seq(
      0L -> ("aa" + needle + "bb" + needle + "cc"), // within-doc repeat
      1L -> ("dd" + needle),
      2L -> (needle + "ee"),
      3L -> ("ff" + needle.take(90)),
      4L -> ("identical twin documents! " * 5),
      5L -> ("identical twin documents! " * 5))
    val docs = texts.toDF("id", "text")
    val idx = SuffixArray.buildFull(docs)
    def spans() = SuffixArray.duplicateSpansFrom(idx, docs, minLen = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val viaWindow = spans()
    System.setProperty("graft.sa.deepwindow", "0")
    val viaDescent = try spans()
    finally System.clearProperty("graft.sa.deepwindow")
    assert(viaWindow === viaDescent)
    // and the window path's verdicts are verbatim + in-bounds on their own
    val byId = texts.toMap
    viaWindow.foreach { case (a, o1, b, o2, l) =>
      assert(l <= byId(a).length - o1 && l <= byId(b).length - o2)
      assert(byId(a).substring(o1.toInt, (o1 + l).toInt) ===
        byId(b).substring(o2.toInt, (o2 + l).toInt))
    }
    idx.unpersist()
  }

  test("duplicateSpans: window-saturated pairs (>= 64-char runs) resolve deep and stay exact") {
    import spark.implicits._
    // a 100-char needle (> the 64-char probe window) shared by docs 0 and
    // 2, plus a fully-identical doc pair (3, 4) whose clip must cap the
    // span at the doc length
    val needle = ("abcdefghij" * 10).take(100)
    val twin = "identical twin documents! " * 6 // 156 chars
    val texts = Map(
      0L -> ("xx" + needle + "yy"),
      1L -> "totally unrelated filler content",
      2L -> ("zzzz" + needle),
      3L -> twin,
      4L -> twin)
    val docs = texts.toSeq.sortBy(_._1).toDF("id", "text")
    val spans = SuffixArray.duplicateSpans(docs, minLen = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the full needle pair survives with its exact length
    val needleSpans = spans.filter { case (a, _, b, _, _) =>
      Set(a, b) == Set(0L, 2L) }
    assert(needleSpans.map(_._5).max === needle.length.toLong)
    // the identical twins' best span is the whole doc -- the raw LCP
    // crosses the terminator but the clip caps it at doc length
    val twinSpans = spans.filter { case (a, _, b, _, _) =>
      Set(a, b) == Set(3L, 4L) }
    assert(twinSpans.map(_._5).max === twin.length.toLong)
    // every span still verbatim + in-bounds (both paths agree on clips)
    spans.foreach { case (a, o1, b, o2, l) =>
      assert(l <= texts(a).length - o1 && l <= texts(b).length - o2)
      assert(texts(a).substring(o1.toInt, (o1 + l).toInt) ===
        texts(b).substring(o2.toInt, (o2 + l).toInt))
    }
  }

  test("cleanedCorpus: rank-t cuts merged and reassembled; exactly one needle copy survives") {
    import spark.implicits._
    val needle = "the quick brown fox jumped"
    val texts = Map(
      0L -> ("xxxxxx" + needle + "yyyy"),
      1L -> "completely unrelated content here",
      2L -> ("zzz" + needle + "wwwwww"))
    val docs = texts.toSeq.sortBy(_._1).toDF("id", "text")
    val idx = SuffixArray.buildFull(docs)
    // Scala replay of the documented rule: cut the rank-t side of every
    // span, merge overlaps per doc (touching intervals merge), reassemble
    val spans = SuffixArray.duplicateSpansFrom(idx, docs, minLen = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val expect = texts.map { case (id, t) =>
      val cuts = spans.filter(_._1 == id)
        .map(s => (s._2, s._2 + s._3)).sorted.toVector
      val merged = cuts.foldLeft(Vector.empty[(Long, Long)]) {
        case (acc, (s, e)) => acc.lastOption match {
          case Some((ps, pe)) if s <= pe => acc.init :+ (ps, math.max(pe, e))
          case _ => acc :+ ((s, e))
        }
      }
      val sb = new StringBuilder
      var pos = 0L
      merged.foreach { case (s, e) =>
        sb.append(t.substring(pos.toInt, s.toInt)); pos = e }
      sb.append(t.substring(pos.toInt))
      id -> sb.toString
    }
    val got = SuffixArray.cleanedCorpus(idx, docs, minLen = 11).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    for (id <- texts.keys) {
      assert(got(id)._2 === expect(id), s"doc $id rewrite differs")
      assert(got(id)._1 === (texts(id).length - expect(id).length).toLong)
    }
    // the deliverable: the duplicated needle survives EXACTLY once
    assert(expect.values.map(t =>
      t.sliding(needle.length).count(_ == needle)).sum === 1)
    // and the clean doc is untouched
    assert(expect(1L) === texts(1L))
    idx.unpersist()
  }

  // ---- ingest probe over the stored gram index ---------------------------

  test("ingestDuplicateSpans: coverage equals the brute-force vs-corpus truth; chained grams; witnesses verbatim") {
    import spark.implicits._
    val k = 8
    val corpusTexts = Map(
      0L -> "abcdefghijkl", // left half of the chain
      1L -> "xxefghijklmnopxx", // right half (overlaps 0's tail)
      2L -> "no shared material present inside")
    val corpus = corpusTexts.toSeq.sortBy(_._1).toDF("id", "text")
    val batchTexts = Map(
      10L -> "abcdefghijklmnop", // chained: contiguous NOWHERE in the corpus
      11L -> "QQQQabcdefghZZZZ", // one interior exact gram
      12L -> "qwerty uiop zxcvbnm asdf") // pure noise
    val batch = batchTexts.toSeq.sortBy(_._1).toDF("id", "text")
    val gi = SuffixArray.gramIndex(corpus, k)
    val spans = SuffixArray.ingestDuplicateSpans(gi, batch, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // brute force: char c of batch doc t is duplicated iff some k-gram
    // containing it occurs verbatim in ANY corpus doc; runs = merged
    // maximal covered intervals
    def bruteRuns(t: String): Set[(Long, Long)] = {
      val starts = (0 to t.length - k).filter(j =>
        corpusTexts.values.exists(_.contains(t.substring(j, j + k))))
      val covered = starts.flatMap(j => j until j + k).distinct.sorted
      covered.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc, c) => acc.lastOption match {
          case Some((s, e)) if c == e => acc.init :+ (s, e + 1)
          case _ => acc :+ ((c, c + 1))
        }
      }.map { case (s, e) => (s.toLong, (e - s).toLong) }.toSet
    }
    for ((id, t) <- batchTexts) {
      val got = spans.filter(_._1 == id).map(s => (s._2, s._3)).toSet
      assert(got === bruteRuns(t), s"doc $id coverage differs from brute force")
    }
    // the chained doc is fully covered by ONE run even though its text is
    // contiguous nowhere in the corpus — the documented coverage
    // semantics (every char still sits inside a >= k duplicated substring)
    assert(spans.filter(_._1 == 10L).map(s => (s._2, s._3)).toSeq === Seq((0L, 16L)))
    assert(!corpusTexts.values.exists(_.contains(batchTexts(10L))))
    // each run's witness: the run's FIRST gram occurs verbatim at
    // (witness_doc, witness_off) of the corpus
    spans.foreach { case (id, st, _, wd, wo) =>
      assert(corpusTexts(wd).substring(wo.toInt, wo.toInt + k) ===
        batchTexts(id).substring(st.toInt, st.toInt + k))
    }
    assert(!spans.exists(_._1 == 12L))
  }

  test("gramIndexAppend ≡ rebuild over the union under the fresh-id contract; stored witnesses never move") {
    import spark.implicits._
    val k = 5
    val corpus = Seq(
      (3L, "shared gram here"), // 'share','hared',... incl. grams batch repeats
      (7L, "other corpus doc")).toDF("id", "text")
    // fresh-id batch: one doc REPEATING a corpus gram (witness must stay
    // the corpus's), one doc with wholly novel grams (enters with its own)
    val batch = Seq(
      (100L, "shared gram again"),
      (101L, "zzzzz novel yyyyy")).toDF("id", "text")
    val stored = SuffixArray.gramIndex(corpus, k)
    val appended = SuffixArray.gramIndexAppend(stored, batch, k)
    val rebuilt = SuffixArray.gramIndex(corpus.unionByName(batch), k)
    def s3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(s3(appended) === s3(rebuilt))
    // the repeated gram kept its corpus witness; the novel gram entered
    // with a batch witness
    val m = s3(appended).map(x => x._1 -> ((x._2, x._3))).toMap
    assert(m("share") === ((3L, 0L)))
    assert(m("novel")._1 === 101L)
    // the contract is NECESSARY: a batch id BELOW the corpus range makes
    // the rebuild's witness move where the append keeps the stored one —
    // this is why ingest ids are max(id)+1-derived
    val lowBatch = Seq((0L, "shared gram again")).toDF("id", "text")
    val appended2 = SuffixArray.gramIndexAppend(stored, lowBatch, k)
    val rebuilt2 = SuffixArray.gramIndex(corpus.unionByName(lowBatch), k)
    assert(s3(appended2) !== s3(rebuilt2))
  }

  test("ingest probe ≡ union-rebuild cross spans (the q179-shape equivalence, without paying the rebuild)") {
    import spark.implicits._
    val k = 11
    val needle = "the quick brown fox jumped over"
    val corpusTexts = Map(
      0L -> ("aaaa " + needle + " bbbb"),
      1L -> "unrelated corpus content entirely")
    val batchTexts = Map(
      5L -> ("cccc " + needle + " dddd"),
      6L -> "novel batch document text qqqq")
    val corpus = corpusTexts.toSeq.sortBy(_._1).toDF("id", "text")
    val batch = batchTexts.toSeq.sortBy(_._1).toDF("id", "text")
    val probe = SuffixArray.ingestDuplicateSpans(
      SuffixArray.gramIndex(corpus, k), batch, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the expensive path the probe replaces: full SA rebuild over corpus
    // ∪ batch, spans restricted to (batch × corpus) pairs, batch-side
    // coverage. (Cross-pair restriction is complete HERE because no two
    // batch docs share corpus-duplicated content — in general a batch
    // suffix can rank-adjoin another batch suffix and the cross pairs
    // alone under-cover, which is why the probe's brute-force equality
    // test above is the load-bearing one.)
    val rebuilt = SuffixArray.duplicateSpans(
      corpus.unionByName(batch), minLen = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val batchIds = batchTexts.keySet
    val crossCover = rebuilt.flatMap { case (a, oa, b, ob, l) =>
      (if (batchIds(a) && !batchIds(b)) (oa until oa + l).map((a, _)) else Seq()) ++
        (if (batchIds(b) && !batchIds(a)) (ob until ob + l).map((b, _)) else Seq())
    }.toSet
    val probeCover = probe.flatMap { case (id, st, ln) =>
      (st until st + ln).map((id, _))
    }.toSet
    assert(probeCover === crossCover)
    assert(probeCover.nonEmpty)
  }

  test("duplicateSpans audits q110: winnowed coverage within exact; long exact runs anchored") {
    import spark.implicits._
    // one long cross-doc duplicate (30 chars >= k+w-1 = 11); docs 2/3 noise
    val dup = "abcdefghijklmnopqrstuvwxyz0123"
    val texts = Map(
      0L -> ("AAAA " + dup + " BBBB"),
      1L -> ("CCCCCC " + dup + " DD"),
      2L -> "unrelated filler text block",
      3L -> "more noise without repeats!!")
    val docs = texts.toSeq.sortBy(_._1).toDF("id", "text")
    // exact CROSS-DOC duplicated-position coverage per doc at minLen=8
    // (q110's k-gram size) and the >= 11 spans (its winnowing guarantee)
    val exact = SuffixArray.duplicateSpans(docs, minLen = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .filter { case (a, _, b, _, _) => a != b }
    val cover8 = exact.flatMap { case (a, o1, b, o2, l) =>
      (o1 until o1 + l).map((a, _)) ++ (o2 until o2 + l).map((b, _))
    }.toSet
    val long11 = SuffixArray.duplicateSpans(docs, minLen = 11).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
      .filter { case (a, b, _) => a != b }
    assert(long11.nonEmpty, "the planted 30-char run must surface")
    val q110 = graft.operators.Dedup.dupSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap // id -> dup_chars
    // soundness: q110 duplicated chars never exceed the exact cross-doc
    // coverage (every shared winnowed anchor k-gram IS an exact duplicate)
    for (id <- texts.keys) {
      val exactChars = cover8.count(_._1 == id).toLong
      assert(q110.getOrElse(id, 0L) <= exactChars,
        s"doc $id: winnowed dup_chars > exact coverage")
    }
    // recall: every doc holding an exact >= 11 cross-doc run is flagged by
    // q110 (winnowing guarantees an anchor in any shared >= k+w-1 run)
    long11.flatMap { case (a, b, _) => Seq(a, b) }.distinct.foreach { id =>
      assert(q110.getOrElse(id, 0L) > 0L,
        s"doc $id has an exact >=11 dup but q110 reports none")
    }
    // and the noise docs are clean on both sides
    assert(!cover8.exists(_._1 == 3L) && q110.getOrElse(3L, 0L) === 0L)
  }
}
