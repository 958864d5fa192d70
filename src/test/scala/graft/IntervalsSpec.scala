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

  test("islands tolerates duplicate inputs without emitting overlaps") {
    // the contract says distinct, but a stray dup must not break the
    // disjoint/gap>=2 invariant downstream consumers rely on
    val xs = Seq(1L, 2L, 2L, 3L, 10L, 10L).toDF("x")
    val got = Intervals.islands(xs).orderBy("begin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 3L), (10L, 10L)))
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

  test("fully-fragmented set: sweep stays exact with zero merging possible") {
    // 5000 singleton islands (every even number): nothing compresses and
    // nothing merges — the degenerate input that used to serialize the old
    // global-window forms onto one task
    val xs = spark.range(0L, 10000L, 2L).select(col("id").as("x"))
    assert(Intervals.islands(xs).count() === 5000L)
    val frag = spark.range(0L, 15000L, 3L)
      .select(col("id").as("begin"), (col("id") + 1L).as("end"))
    assert(Intervals.mergeNeighbors(frag).count() === 5000L)
    assert(Intervals.mergeOverlapsHO(frag, strict = true).count() === 5000L)
    assert(Intervals.mergeOverlapsHO(frag, strict = false).count() === 5000L)
    assert(Intervals.splitOverlaps(frag).count() === 5000L)
  }

  test("runs spanning many partitions stitch exactly") {
    // a single overlap chain across the whole range: every partition's
    // fragments must stitch into ONE run
    val chain = spark.range(0L, 6000L, 2L)
      .select(col("id").as("begin"), (col("id") + 3L).as("end"))
    assert(ivSet(Intervals.mergeOverlapsHO(chain, strict = true)) ===
      Set((0L, 6001L)))
    // touching chain: strict keeps all links apart, lenient fuses them
    val touch = spark.range(0L, 6000L, 2L)
      .select(col("id").as("begin"), (col("id") + 2L).as("end"))
    assert(Intervals.mergeOverlapsHO(touch, strict = true).count() === 3000L)
    assert(ivSet(Intervals.mergeOverlapsHO(touch, strict = false)) ===
      Set((0L, 6000L)))
    // closed-interval bridge: begin == prev end + 1 merges
    val adj = spark.range(0L, 6000L, 2L)
      .select(col("id").as("begin"), (col("id") + 1L).as("end"))
    assert(ivSet(Intervals.mergeNeighbors(adj)) === Set((0L, 5999L)))
    // mixed: a long carried-through interval bridges local gaps
    val mixed = Seq((0L, 5000L)).toDF("begin", "end").unionByName(
      spark.range(6000L, 9000L, 10L)
        .select(col("id").as("begin"), (col("id") + 2L).as("end")))
    assert(ivSet(Intervals.mergeOverlapsHO(mixed, strict = false)).size === 301)
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

  test("degenerate [a,a) half-open intervals are empty sets: dropped, never bridge") {
    // [5,5) alone -> empty output (the reference's intervaltree refuses
    // null intervals outright; the documented contract here is the
    // half-open reading: an empty set contributes nothing)
    assert(Intervals.mergeOverlapsHO(
      Seq((5L, 5L)).toDF("begin", "end"), strict = false).count() === 0L)
    // [0,5) [5,5) [5,9): the empty set at the touch point must NOT glue
    // the strict merge (its +1/-1 cancel at one boundary)...
    val touch = Seq((0L, 5L), (5L, 5L), (5L, 9L)).toDF("begin", "end")
    assert(ivSet(Intervals.mergeOverlapsHO(touch, strict = true)) ===
      Set((0L, 5L), (5L, 9L)))
    // ...while the lenient merge bridges the touch exactly as it would
    // without the degenerate row
    assert(ivSet(Intervals.mergeOverlapsHO(touch, strict = false)) ===
      Set((0L, 9L)))
    // an isolated degenerate row between real intervals also vanishes
    assert(ivSet(Intervals.mergeOverlapsHO(
      Seq((0L, 2L), (3L, 3L), (4L, 6L)).toDF("begin", "end"),
      strict = false)) === Set((0L, 2L), (4L, 6L)))
  }
}
