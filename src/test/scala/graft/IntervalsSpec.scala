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
}
