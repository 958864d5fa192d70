package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ivm

class IvmSpec extends SparkSpec {
  import spark.implicits._

  // facts: (k1, k2, m) — two groups under (k1), three under (k1, k2)
  private lazy val base = Seq(
    ("a", "x", 10L), ("a", "x", 5L), ("a", "y", 7L), ("b", "x", 100L))
    .toDF("k1", "k2", "m")

  private def asSet(df: DataFrame): Set[(String, String, Long, Long)] =
    df.select(col("k1"), col("k2"), col("cnt"), col("sum_m"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("applyDelta equals full recompute: inserts, deletes, vanish, new group") {
    val state = Ivm.aggState(base, Seq("k1", "k2"), Seq("m"))
    val delta = Seq(
      ("a", "x", 5L, -1L),   // partial delete
      ("a", "y", 7L, -1L),   // full delete -> group (a,y) must VANISH
      ("b", "x", 50L, 1L),   // insert into existing group
      ("c", "z", 9L, 1L))    // brand-new group appears
      .toDF("k1", "k2", "m", "op")
    val merged = Ivm.applyDelta(state, delta, Seq("k1", "k2"), Seq("m"))

    val live = base
      .except(Seq(("a", "x", 5L), ("a", "y", 7L)).toDF("k1", "k2", "m"))
      .union(Seq(("b", "x", 50L), ("c", "z", 9L)).toDF("k1", "k2", "m"))
    assert(asSet(merged) === asSet(Ivm.aggState(live, Seq("k1", "k2"), Seq("m"))))
    assert(asSet(merged) === Set(
      ("a", "x", 1L, 10L), ("b", "x", 2L, 150L), ("c", "z", 1L, 9L)))
  }

  test("applyDelta twice composes (refresh is associative over batches)") {
    val state = Ivm.aggState(base, Seq("k1", "k2"), Seq("m"))
    val d1 = Seq(("a", "x", 3L, 1L)).toDF("k1", "k2", "m", "op")
    val d2 = Seq(("a", "x", 3L, -1L), ("a", "x", 10L, -1L))
      .toDF("k1", "k2", "m", "op")
    val twice = Ivm.applyDelta(
      Ivm.applyDelta(state, d1, Seq("k1", "k2"), Seq("m")),
      d2, Seq("k1", "k2"), Seq("m"))
    val once = Ivm.applyDelta(state, d1.union(d2), Seq("k1", "k2"), Seq("m"))
    assert(asSet(twice) === asSet(once))
  }

  test("rollupLevels: grouping_id bitmask levels match Spark's native rollup") {
    val finest = Ivm.aggState(base, Seq("k1", "k2"), Seq("m"))
    val got = Ivm.rollupLevels(finest, Seq("k1", "k2"), Seq("m"))
      .select(coalesce(col("k1"), lit("-")), coalesce(col("k2"), lit("-")),
        col("level"), col("cnt"), col("sum_m"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    val want = base.rollup(col("k1"), col("k2"))
      .agg(grouping_id().as("level"), count(lit(1)).as("cnt"),
        sum(col("m")).as("sum_m"))
      .select(coalesce(col("k1"), lit("-")), coalesce(col("k2"), lit("-")),
        col("level"), col("cnt"), col("sum_m"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(got === want)
    // the level ids themselves: (k1,k2)=0, (k1)=1, ()=3
    assert(got.map(_._3) === Set(0L, 1L, 3L))
  }
}
