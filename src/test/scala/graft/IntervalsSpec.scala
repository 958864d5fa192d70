package graft

import org.apache.spark.sql.functions._

import graft.operators.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("islands reproduces the reference docstring example") {
    // utils.py:343-360: {1..6, 45..48, 110..112} -> [[1,6],[45,48],[110,112]]
    val xs = ((1L to 6L) ++ (45L to 48L) ++ (110L to 112L)).toDF("x")
    val got = Intervals.islands(xs).orderBy("begin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 6L), (45L, 48L), (110L, 112L)))
  }

  test("membership: closed-interval semantics") {
    val iv = Seq((1L, 6L), (45L, 48L)).toDF("begin", "end")
    val xs = Seq(0L, 1L, 6L, 7L, 46L, 49L).toDF("x")
    val got = Intervals.membership(xs, iv).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got === Map(0L -> false, 1L -> true, 6L -> true,
      7L -> false, 46L -> true, 49L -> false))
  }

  test("mergeNeighbors merges adjacent and overlapping intervals") {
    val iv = Seq((1L, 3L), (4L, 6L), (5L, 8L), (10L, 12L)).toDF("begin", "end")
    val got = Intervals.mergeNeighbors(iv).orderBy("begin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 8L), (10L, 12L)))
  }

  private def ivSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("chop trims hangers and removes enveloped intervals (half-open)") {
    val iv = Seq((0L, 10L), (12L, 14L), (15L, 25L), (30L, 40L)).toDF("begin", "end")
    // chop [5, 20): (0,10)->(0,5); (12,14) enveloped -> gone; (15,25)->(20,25)
    assert(ivSet(Intervals.chop(iv, 5L, 20L)) ===
      Set((0L, 5L), (20L, 25L), (30L, 40L)))
  }

  test("slice splits intervals strictly containing the point") {
    val iv = Seq((0L, 10L), (10L, 20L), (25L, 30L)).toDF("begin", "end")
    assert(ivSet(Intervals.slice(iv, 10L)) === ivSet(iv)) // boundary: no-op
    assert(ivSet(Intervals.slice(iv, 5L)) ===
      Set((0L, 5L), (5L, 10L), (10L, 20L), (25L, 30L)))
  }

  test("splitOverlaps atomizes along all boundaries (intervaltree semantics)") {
    val iv = Seq((0L, 10L), (5L, 15L), (20L, 25L)).toDF("begin", "end")
    assert(ivSet(Intervals.splitOverlaps(iv)) ===
      Set((0L, 5L), (5L, 10L), (10L, 15L), (20L, 25L)))
  }

  test("difference/intersection/union are exact-set ops; merge_overlaps strict flag") {
    val a = Seq((0L, 5L), (10L, 15L), (20L, 25L)).toDF("begin", "end")
    val b = Seq((10L, 15L), (40L, 45L)).toDF("begin", "end")
    assert(ivSet(Intervals.difference(a, b)) === Set((0L, 5L), (20L, 25L)))
    assert(ivSet(Intervals.intersection(a, b)) === Set((10L, 15L)))
    assert(ivSet(Intervals.union(a, b)) ===
      Set((0L, 5L), (10L, 15L), (20L, 25L), (40L, 45L)))
    // touching intervals: strict keeps them apart, non-strict merges
    val t = Seq((0L, 5L), (5L, 8L), (9L, 12L)).toDF("begin", "end")
    assert(ivSet(Intervals.mergeOverlapsHO(t, strict = true)) === ivSet(t))
    assert(ivSet(Intervals.mergeOverlapsHO(t, strict = false)) ===
      Set((0L, 8L), (9L, 12L)))
    // remove_overlap vs remove_envelop
    val r = Seq((0L, 10L), (12L, 14L), (15L, 25L)).toDF("begin", "end")
    assert(ivSet(Intervals.removeOverlap(r, 5L, 13L)) === Set((15L, 25L)))
    assert(ivSet(Intervals.removeEnvelop(r, 5L, 20L)) === Set((0L, 10L), (15L, 25L)))
  }
}
