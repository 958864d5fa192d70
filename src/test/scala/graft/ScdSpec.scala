package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Scd}

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // change log: user 1 changes twice (second time with two simultaneous
  // events — the later event_id must win), user 2 changes once
  private lazy val log = Seq(
    (10L, ts("2024-01-01 00:00:00"), 1L, "a", 1.0),
    (11L, ts("2024-01-02 00:00:00"), 1L, "b", 2.0),
    (12L, ts("2024-01-02 00:00:00"), 1L, "c", 3.0), // same ts, higher id: wins
    (13L, ts("2024-01-05 00:00:00"), 2L, "z", 9.0))
    .toDF("event_id", "ts", "user_id", "state", "value")

  test("scdHistory: versioned validity intervals, last-wins collapse") {
    val got = Scd.scdHistory(log, "user_id", "ts", "event_id",
        Seq("state", "value"))
      .select(col("user_id"), col("version"), col("eff_from"), col("eff_to"),
        col("is_current"), col("state"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4), r.getString(5),
        r.getDouble(6)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 1, ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")),
        false, "a", 1.0),
      (1L, 2, ts("2024-01-02 00:00:00"), None, true, "c", 3.0),
      (2L, 1, ts("2024-01-05 00:00:00"), None, true, "z", 9.0)))
  }

  test("point-in-time: asof over the collapsed log matches the history interval") {
    // probe user 1 at Jan 1 12:00 (inside version 1) and Jan 3 (version 2)
    val probes = Seq(
      (100L, 1L, ts("2024-01-01 12:00:00")),
      (101L, 1L, ts("2024-01-03 00:00:00")),
      (102L, 2L, ts("2024-01-06 00:00:00")))
      .toDF("probe_id", "user_id", "ts")
    val changes = Scd.collapse(log, "user_id", "ts", "event_id",
      Seq("state", "value"))
    val got = AsOfJoin.asof(probes, changes, "user_id", "ts")
      .select(col("probe_id"), col("matched.state"), col("matched.value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (100L, "a", 1.0), (101L, "c", 3.0), (102L, "z", 9.0)))
  }

  test("asof at an exact version boundary is inclusive (eff_from, not the prior version)") {
    val probes = Seq((200L, 1L, ts("2024-01-02 00:00:00"))).toDF("probe_id", "user_id", "ts")
    val changes = Scd.collapse(log, "user_id", "ts", "event_id", Seq("state", "value"))
    val got = AsOfJoin.asof(probes, changes, "user_id", "ts")
      .select(col("matched.state")).head().getString(0)
    assert(got === "c")
  }
}
