package graft

import graft.operators.TextMatch

/** Aho–Corasick multi-pattern matcher (q170's kernel). Ground truth in
  * every test is independent brute force: enumerate all (start, pattern)
  * with text.startsWith(pattern, start) — the overlap-inclusive,
  * nested-inclusive semantics the oracle replays by position
  * enumeration. */
class TextMatchSpec extends SparkSpec {

  private def brute(text: String, pats: Seq[(Int, String)]): Set[(Int, Int)] =
    (for {
      (id, p) <- pats
      i <- 0 to text.length - p.length
      if text.startsWith(p, i)
    } yield (id, i)).toSet

  private def ac(text: String, pats: Seq[(Int, String)]): Set[(Int, Int)] = {
    val a = TextMatch.compile(pats)
    a.matches(text).map { case (pid, end) => (pid, end - a.patternLengths(pid)) }.toSet
  }

  test("the textbook case: he/she/his/hers over 'ushers', dictionary links fire") {
    val pats = Seq(0 -> "he", 1 -> "she", 2 -> "his", 3 -> "hers")
    // "she" ends at 4 and its proper suffix "he" must fire at the same
    // character via the dict link; "hers" ends at 6
    assert(ac("ushers", pats) === Set((1, 1), (0, 2), (3, 2)))
  }

  test("nested and duplicated patterns all fire, overlap-inclusive") {
    val pats = Seq(0 -> "a", 1 -> "aa", 2 -> "aaa", 3 -> "aa")
    val got = ac("aaaa", pats)
    assert(got === brute("aaaa", pats))
    // duplicates under distinct ids report independently
    assert(got.count(_._1 == 1) === 3 && got.count(_._1 == 3) === 3)
    assert(got.count(_._1 == 0) === 4 && got.count(_._1 == 2) === 2)
  }

  test("randomized parity with brute force (small alphabet, heavy overlap)") {
    val r = new scala.util.Random(7)
    for (round <- 0 until 40) {
      val text = (0 until 80 + r.nextInt(120)).map(_ => ('a' + r.nextInt(3)).toChar).mkString
      val pats = (0 until 1 + r.nextInt(12)).map { id =>
        id -> (0 until 1 + r.nextInt(4)).map(_ => ('a' + r.nextInt(3)).toChar).mkString
      }.filter(_._2.nonEmpty)
      if (pats.nonEmpty)
        assert(ac(text, pats) === brute(text, pats), s"round $round pats=$pats")
    }
  }

  test("edges: no match, empty text, pattern longer than text, empty pattern rejected") {
    val pats = Seq(0 -> "xyz", 1 -> "longerthantext")
    assert(ac("abcabc", pats).isEmpty)
    assert(ac("", pats).isEmpty)
    assert(ac("xy", pats).isEmpty)
    assertThrows[IllegalArgumentException](TextMatch.compile(Seq(0 -> "")))
    assertThrows[IllegalArgumentException](TextMatch.compile(Nil))
  }

  test("matchAll / matchCounts DataFrame shape equals brute force") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "catamaran cataract"),
      (2L, "no hits here"),
      (3L, "")).toDF("id", "text")
    val pats = Seq((0, "cat"), (1, "at"), (2, "the")).toDF("pat_id", "pattern")
    val got = TextMatch.matchAll(spark, docs, pats)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val want = (for {
      (id, text) <- Seq((0L, "the cat sat on the mat"), (1L, "catamaran cataract"),
        (2L, "no hits here"), (3L, ""))
      (pid, m) <- brute(text, Seq(0 -> "cat", 1 -> "at", 2 -> "the")).toSeq
    } yield (id, pid, m)).toSet
    assert(got === want)
    val counts = TextMatch.matchCounts(spark, docs, pats)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getInt(3)))).toMap
    assert(counts((1L, 0)) === ((2L, 0)))  // "cat" twice in doc 1, first at 0
    assert(counts((0L, 1)) === ((3L, 5)))  // "at" in cat/sat/mat
    assert(!counts.contains((2L, 0)))      // zero-hit pairs are absent
  }

  test("small-dimension contract: oversized pattern sets are rejected loudly") {
    import spark.implicits._
    val docs = Seq((0L, "x")).toDF("id", "text")
    val pats = (0 until 10).map(i => (i, "p" + i)).toDF("pat_id", "pattern")
    assertThrows[IllegalArgumentException](
      TextMatch.matchAll(spark, docs, pats, maxPatterns = 5).collect())
  }
}
