package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("phraseMatch: exact occurrence counts, adjacency required, repeats handled") {
    val docs = Seq(
      (1L, "a b c a b c"),     // "a b c" twice
      (2L, "a b x c"),         // terms present, never adjacent as a phrase
      (3L, "c b a"),           // reversed — order matters
      (4L, "a b a b a")        // overlapping "a b a" at starts 0 and 2
    ).toDF("id", "text")
    val idx = Retrieval.positionalIndex(docs)
    def phrase(qid: Long, words: String*) =
      words.zipWithIndex.map { case (w, i) => (qid, i, w) }
    val phrases = (phrase(10L, "a", "b", "c") ++ phrase(11L, "a", "b", "a"))
      .toDF("qid", "i", "term")
    val got = Retrieval.phraseMatch(idx, phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((10L, 1L, 2L), (11L, 4L, 2L)))
  }

  test("phraseMatchBigram: row-identical to phraseMatch for n >= 2 phrases") {
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b x c"),
      (3L, "c b a"),
      (4L, "a b a b a"),
      (5L, "x a b y a b c z")
    ).toDF("id", "text")
    val uni = Retrieval.positionalIndex(docs)
    val bg = Retrieval.positionalBigramIndex(docs)
    def phrase(qid: Long, words: String*) =
      words.zipWithIndex.map { case (w, i) => (qid, i, w) }
    val phrases = (phrase(10L, "a", "b", "c") ++ phrase(11L, "a", "b", "a") ++
      phrase(12L, "b", "c") ++ phrase(13L, "c", "z"))
      .toDF("qid", "i", "term")
    val viaUni = Retrieval.phraseMatch(uni, phrases)
    val viaBg = Retrieval.phraseMatchBigram(bg, phrases)
    assert(viaBg.except(viaUni).count() === 0)
    assert(viaUni.except(viaBg).count() === 0)
    // and the expected occurrences are what both report
    val got = viaBg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((10L, 1L, 2L), (10L, 5L, 1L), (11L, 4L, 2L),
      (12L, 1L, 2L), (12L, 5L, 1L), (13L, 5L, 1L)))
  }

  test("positionalBigramIndex: one row per adjacent pair, raw split positions") {
    val docs = Seq((7L, "a b c")).toDF("id", "text")
    val rows = Retrieval.positionalBigramIndex(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows === Set((7L, 0, "a b"), (7L, 1, "b c")))
  }

  test("bm25TopK matches a hand computation (idf, tf saturation, length norm)") {
    val docs = Seq(
      (1L, "cat sat mat"),
      (2L, "cat cat dog"),
      (3L, "dog runs far away")).toDF("id", "text")
    val queries = Seq((10L, "cat dog")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, queries, k = 10).collect()
      .map(r => (r.getLong(2), r.getInt(1), r.getDouble(3))).sortBy(_._1)
    // hand replay: N=3, avgdl = (3+3+4)/3
    val n = 3.0
    val avgdl = 10.0 / 3.0
    def idf(df: Long) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Long, dl: Long, df: Long) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r4(x: Double) =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    // doc1: cat(tf1,dl3); doc2: cat(tf2)+dog(tf1) dl3; doc3: dog(tf1,dl4)
    val exp = Map(
      1L -> r4(term(1, 3, 2)),
      2L -> r4(term(2, 3, 2) + term(1, 3, 2)),
      3L -> r4(term(1, 4, 2)))
    got.foreach { case (id, _, score) => assert(score === exp(id), s"doc $id") }
    // doc2 matches both terms -> must rank first
    assert(got.find(_._1 == 2L).get._2 === 1)
  }

  test("duplicate query terms score once (distinct convention)") {
    val docs = Seq((1L, "cat sat"), (2L, "dog ran")).toDF("id", "text")
    val q1 = Seq((10L, "cat cat cat")).toDF("qid", "qtext")
    val q2 = Seq((10L, "cat")).toDF("qid", "qtext")
    val s1 = Retrieval.bm25TopK(docs, q1, 10).collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    val s2 = Retrieval.bm25TopK(docs, q2, 10).collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(s1 === s2)
  }

  test("rrfFuse: integer reciprocals, doc in both lists outranks singles") {
    val a = Seq((10L, 1, 100L), (10L, 2, 101L)).toDF("qid", "rank", "id")
    val b = Seq((10L, 1, 101L), (10L, 2, 102L)).toDF("qid", "rank", "id")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    def rr(rank: Long) = 1000000000000L / (60L + rank)
    // 101 appears in both (ranks 2 and 1) -> fused rr(2)+rr(1)
    assert(got.toSeq === Seq(
      (1, 101L, rr(2) + rr(1)),
      (2, 100L, rr(1)),
      (3, 102L, rr(2))))
  }

  test("maxPassage: exact chunk scores 1.0, max picks the dense passage") {
    import spark.implicits._
    def krBucket(w: String): Long =
      w.foldLeft(0L)((acc, c) => (acc * 257L + c.toLong) % 1000000007L) % 64
    val qWords = Seq("apple", "banana", "cherry")
    val qBuckets = qWords.map(krBucket).toSet
    // a filler whose bucket collides with no query word, chosen the same
    // way the engine hashes, so the hand cosine below is exact
    val pad = (1 to 1000).map(i => s"pad$i")
      .find(w => !qBuckets.contains(krBucket(w))).get
    val docs = Seq(
      // doc 1: one chunk == the query -> cosine exactly 1.0
      (1L, qWords.mkString(" ")),
      // doc 2: 33 tokens -> 2 chunks; query words sit at 25..27 so the
      // SECOND chunk (9 tokens: 3 query + 6 pad) is the dense passage
      (2L, (Seq.fill(24)(pad) ++ qWords ++ Seq.fill(6)(pad)).mkString(" ")),
      // doc 3: no shared bucket with the query -> never scores
      (3L, Seq.fill(5)(pad).mkString(" "))).toDF("id", "text")
    val queries = Seq((100L, qWords.mkString(" "))).toDF("qid", "qtext")
    val got = Retrieval.maxPassage(docs, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // chunk2 of doc 2: dot 3, |c| = sqrt(3 + 36), |q| = sqrt(3)
    val dense = BigDecimal(3.0 / (math.sqrt(3.0) * math.sqrt(39.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq((100L, 1, 1L, 1.0), (100L, 2, 2L, dense)))
  }
}
