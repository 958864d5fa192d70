package graft

import org.apache.spark.sql.functions._

import graft.operators.Timeseries

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillLocf: per-key grid, carry-forward, is_gap flags") {
    // key 1: days 10..14 with a 2-day hole; key 2: single day (no grid)
    val obs = Seq((1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 14L, 5.0),
        (2L, 20L, 9.0))
      .toDF("k", "day", "v")
    val got = Timeseries.gapFillLocf(obs, "k", "day", "v")
      .select(col("k"), col("day"), col("v"), col("is_gap"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 10L, 1.0, false), (1L, 11L, 2.0, false),
      (1L, 12L, 2.0, true), (1L, 13L, 2.0, true), (1L, 14L, 5.0, false),
      (2L, 20L, 9.0, false)))
  }

  test("gapFillLocf: maxSpan guard fails loud on a runaway key") {
    val obs = Seq((1L, 0L, 1.0), (1L, 1000L, 2.0)).toDF("k", "day", "v")
    val e = intercept[Exception] {
      Timeseries.gapFillLocf(obs, "k", "day", "v", maxSpan = 100L)
        .collect()
    }
    assert(e.getMessage.contains("maxSpan") ||
      Option(e.getCause).exists(_.getMessage.contains("maxSpan")))
  }

  test("funnel: strictly-after cascade, same-tick does not count") {
    val ev = Seq(
      // user 1 completes all three in order
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // user 2: click at the SAME ms as view -> click must not count;
      // a later click does, but no purchase follows
      (2L, 100L, "view"), (2L, 100L, "click"), (2L, 150L, "click"),
      // user 3: purchase BEFORE view -> only t1 (a later purchase would
      // need a click first)
      (3L, 50L, "purchase"), (3L, 100L, "view"),
      // user 4: never views -> absent entirely
      (4L, 10L, "click"))
      .toDF("k", "ms", "stage")
    val got = Timeseries.funnel(ev, "k", "ms", "stage",
        Seq("view", "click", "purchase"))
      .select(col("k"), col("t1"), col("t2"), col("t3"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 100L, 200L, 300L),
      (2L, 100L, 150L, -1L),
      (3L, 100L, -1L, -1L)))
  }

  test("cohortRetention: offsets counted from each key's first period") {
    val ev = Seq(
      (1L, 10L), (1L, 11L), (1L, 13L), // cohort 10, offsets 0,1,3
      (2L, 10L), (2L, 11L),            // cohort 10, offsets 0,1
      (3L, 11L))                       // cohort 11, offset 0
      .toDF("k", "wk")
    val got = Timeseries.cohortRetention(ev, "k", "wk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (10L, 0L, 2L), (10L, 1L, 2L), (10L, 3L, 1L),
      (11L, 0L, 1L)))
  }
}
