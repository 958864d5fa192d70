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
}
