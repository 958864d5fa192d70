package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: hand-computed Morton interleave") {
    // x=5 (101b) -> z bits 0,4; y=3 (011b) -> z bits 1,3
    // z = 1 + 2 + 8 + 16 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(got === 27L)
  }

  test("zValue masks out-of-range bits") {
    // x = 8 + 5: bit 3 is beyond bits=3, masked away -> same as x=5
    val got = Seq((13L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(got === 27L)
  }

  test("zValue locality: nearby points share high bits, distant ones don't") {
    val z = (x: Long, y: Long) => Seq((x, y)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z")).head().getLong(0)
    // (10,20) and (11,21) agree above the low interleaved bits
    assert((z(10, 20) >> 4) === (z(11, 21) >> 4))
    // (10,20) and (200,200) split at the top
    assert((z(10, 20) >> 12) !== (z(200, 200) >> 12))
  }

  test("writeBucketed: co-located join plans with zero exchange under it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val left = (0L until 40L).map(i => (i % 10, i)).toDF("k", "v")
    val right = (0L until 10L).map(i => (i, s"g${i % 3}")).toDF("k", "grp")
    Layout.writeBucketed(left, numBuckets = 4, key = "k",
      tableName = "bkt_left_spec", path = s"$tmp/l")
    Layout.writeBucketed(right, numBuckets = 4, key = "k",
      tableName = "bkt_right_spec", path = s"$tmp/r")
    // at most one file per bucket (empty buckets write none): the
    // repartition on the bucket hash sends each bucket to exactly one
    // write task
    val files = new java.io.File(s"$tmp/l").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 4 && files > 0)
    val joined = spark.table("bkt_left_spec").hint("merge")
      .join(spark.table("bkt_right_spec"), "k")
      .groupBy($"grp").agg(sum($"v").as("sv"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    // the ONLY exchange is the final group-by; the join reads the bucket
    // distribution straight off the scans
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") === 1)
    // the layout never changes the rows
    val expect = left.join(right, "k").groupBy($"grp").agg(sum($"v").as("sv"))
    assert(joined.collect().toSet === expect.collect().toSet)
  }

  test("zOrderBucketStats: buckets, footer stats, scan pruning") {
    // bits=2, gridBits=1 -> bucket = top 2 of 4 z bits = (x>>1, y>>1)
    // interleaved: bucket = (y_hi << 1) | x_hi
    val df = Seq(
      (0L, 0L), (1L, 1L), // bucket 0 (x<2, y<2)
      (3L, 0L), // bucket 1 (x_hi=1, y_hi=0)
      (0L, 3L), // bucket 2
      (2L, 2L), (3L, 3L)) // bucket 3
      .toDF("x", "y")
    val got = Layout.zOrderBucketStats(df, "x", "y",
        bits = 2, gridBits = 1, scanLo = 3L, scanHi = 3L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 2L, 0L, 1L, 0L, 1L, false), // max_x=1 < 3: pruned
      (1L, 1L, 3L, 3L, 0L, 0L, true),
      (2L, 1L, 0L, 0L, 3L, 3L, false),
      (3L, 2L, 2L, 3L, 2L, 3L, true)))
  }
}
