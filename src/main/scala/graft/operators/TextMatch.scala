package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Multi-pattern exact substring matching (Aho–Corasick 1975) — the
  * blocklist/termlist scan every large-scale corpus pipeline runs:
  * bad-word and boilerplate filters, contamination needle sweeps, PII
  * keyword triage. The operator answers "which of these P patterns occur
  * where in each document" in ONE pass over the text.
  *
  * Why this exists next to `contains`/`LIKE`/regex alternation: P
  * per-pattern predicates cost O(P · len) per document (P full scans of
  * every document — the thing that kills a 10k-term blocklist over
  * 100 TB), and regex alternation engines give no occurrence positions
  * and degrade unpredictably. The AC automaton is O(Σ pattern lengths)
  * to build, and matching is O(len + matches) per document INDEPENDENT
  * of P: each character advances the state machine once; dictionary
  * (output) links surface every pattern ending at that character,
  * overlaps and nested patterns included.
  *
  * Distribution shape: the pattern list is the classic small dimension —
  * collected once (bounded: blocklists are KB–MB; `require`-guarded),
  * compiled driver-side, BROADCAST as one automaton, and streamed
  * against each partition's documents. No shuffle enters the scan; the
  * output is (doc, pattern, position) facts sized by the matches
  * themselves. At 100 TB that is: one automaton per executor, one pass
  * over every text split, Θ(matches) output — the same plan at every
  * scale.
  *
  * Match semantics (pinned by spec + oracle): case-sensitive exact char
  * match; ALL occurrences reported, including overlapping ones and
  * patterns nested inside longer patterns ("he" inside "she"); a pattern
  * appearing k times yields k rows. This is exactly DuckDB's
  * position-enumeration count, so the oracle replays it verbatim. */
object TextMatch {

  /** Immutable, serializable Aho–Corasick automaton. Built driver-side
    * ([[compile]]), shipped by broadcast. States are dense ints; `gotoT`
    * holds per-state sorted (char, next) pairs for binary search —
    * compact to serialize, cache-friendly to probe; `fail` is the KMP
    * border generalization; `out` chains dictionary suffix links so
    * every pattern ending at a state is emitted without walking raw
    * fail links per character. */
  final class AcAutomaton private[TextMatch] (
      private[TextMatch] val gotoChars: Array[Array[Char]],
      private[TextMatch] val gotoNext: Array[Array[Int]],
      private[TextMatch] val fail: Array[Int],
      // pattern ids ending EXACTLY at this state (vocabulary may hold
      // duplicates of a pattern string under distinct ids)
      private[TextMatch] val hits: Array[Array[Int]],
      // dictionary suffix link: deepest proper-suffix state that is a
      // pattern end (0 = none)
      private[TextMatch] val dict: Array[Int],
      val patternLengths: Array[Int]) extends Serializable {

    def nStates: Int = fail.length

    @inline private def step(state: Int, c: Char): Int = {
      var s = state
      while (true) {
        val chars = gotoChars(s)
        var lo = 0; var hi = chars.length - 1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val mc = chars(mid)
          if (mc == c) return gotoNext(s)(mid)
          else if (mc < c) lo = mid + 1
          else hi = mid - 1
        }
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** All matches in `text`: (patternId, endExclusive) — start is
      * end − patternLengths(patternId). */
    def matches(text: String): Iterator[(Int, Int)] = {
      var s = 0
      val out = Vector.newBuilder[(Int, Int)]
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        var t = s
        while (t != 0) {
          val h = hits(t)
          var k = 0
          while (k < h.length) { out += ((h(k), i + 1)); k += 1 }
          t = dict(t)
        }
        i += 1
      }
      out.result().iterator
    }
  }

  /** Build the automaton from (id, pattern) pairs. Empty patterns are
    * rejected (they would match at every position). */
  def compile(patterns: Seq[(Int, String)]): AcAutomaton = {
    require(patterns.nonEmpty, "empty pattern set")
    patterns.foreach { case (id, p) =>
      require(p.nonEmpty, s"empty pattern (id $id) matches everywhere")
    }
    // trie build with growable per-state sorted maps
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.foreach { case (id, p) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += scala.collection.mutable.TreeMap.empty[Char, Int]
          ends += Nil
          children.length - 1
        })
      }
      ends(s) = id :: ends(s)
    }
    val n = children.length
    val endArr = ends.map(_.reverse.toVector).toArray
    // BFS fail links; fail(nx) = the longest proper-suffix state with a
    // c-transition (found by walking s's fail chain), root otherwise.
    // The walk never lands on s itself (fail strictly decreases depth),
    // so the found transition can never be nx.
    val fail = new Array[Int](n)
    val dict = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      children(s).foreach { case (c, nx) =>
        var f = fail(s)
        var target = children(f).get(c)
        while (target.isEmpty && f != 0) { f = fail(f); target = children(f).get(c) }
        fail(nx) = target.getOrElse(0)
        dict(nx) = if (endArr(fail(nx)).nonEmpty) fail(nx) else dict(fail(nx))
        queue += nx
      }
    }
    val gotoChars = Array.tabulate(n)(s => children(s).keys.toArray)
    val gotoNext = Array.tabulate(n)(s => children(s).values.toArray)
    val maxId = patterns.map(_._1).max
    val lens = new Array[Int](maxId + 1)
    patterns.foreach { case (id, p) => lens(id) = p.length }
    new AcAutomaton(gotoChars, gotoNext, fail,
      endArr.map(_.toArray), dict, lens)
  }

  /** Scan `docs` (id, text) against `patterns` (pat_id, pattern):
    * one automaton pass per document, emitting a row per occurrence
    * (id, pat_id, pos) with `pos` the 0-based match START. The pattern
    * side is collected (small-dimension contract, `maxPatterns`-guarded)
    * and broadcast inside the compiled automaton. */
  def matchAll(spark: SparkSession, docs: DataFrame, patterns: DataFrame,
      maxPatterns: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val pats = patterns.select(col("pat_id").cast("int"), col("pattern"))
      .as[(Int, String)].collect()
    require(pats.length <= maxPatterns,
      s"${pats.length} patterns exceed the small-dimension contract ($maxPatterns)")
    val auto = spark.sparkContext.broadcast(compile(pats.toSeq))
    docs.select(col("id").cast("long"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val a = auto.value
        a.matches(text).map { case (pid, end) =>
          (id, pid, end - a.patternLengths(pid))
        }
      }.toDF("id", "pat_id", "pos")
  }

  /** Per-(doc, pattern) rollup: hit count + first occurrence — the
    * blocklist-scoring shape (a doc's filter decision reads this row). */
  def matchCounts(spark: SparkSession, docs: DataFrame, patterns: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{count, min}
    matchAll(spark, docs, patterns)
      .groupBy("id", "pat_id")
      .agg(count("*").as("n_hits"), min("pos").as("first_pos"))
  }
}
