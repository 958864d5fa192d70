package graft

import java.sql.Timestamp
import graft.operators.Streaming
import graft.operators.Streaming.ProfEv

/** The state-store DATA SOURCE (`spark.read.format("statestore")`) over a
  * transformWithState checkpoint — the operational tool a state-heavy
  * pipeline needs for debugging ("what does user X's profile hold right
  * now?"), state audits, and offline migration (read state out, reshape,
  * re-bootstrap via handleInitialState — q162's path). Pins that the
  * MapState rows read back from the q161-family checkpoint equal the
  * aggregates the processor would publish at that instant. */
class StateSourceSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  test("statestore source reads back the live MapState profiles") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_state_src").toString
    val in = MemoryStream[ProfEv]
    // no watermark advancer: nothing flushes, so the whole profile is LIVE
    // state at the last checkpointed batch
    val q = Streaming.userProfiles(in.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("ssrc")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData(Seq(
        ProfEv(7L, "view", t("2024-01-10 12:00:00"), 1.5),
        ProfEv(7L, "view", t("2024-01-10 12:10:00"), 2.0),
        ProfEv(7L, "click", t("2024-01-10 12:20:00"), 3.0),
        ProfEv(8L, "view", t("2024-01-10 12:30:00"), 5.0)))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    // schema: key.value (grouping key), user_map_key.value (map key),
    // user_map_value.{n, sum} (the TypeAgg), partition_id
    val state = spark.read.format("statestore")
      .option("stateVarName", "profile")
      .load(ckpt)
      .collect()
      .map(r => (r.getStruct(0).getLong(0), r.getStruct(1).getString(0)) ->
        ((r.getStruct(2).getLong(0), r.getStruct(2).getDouble(1))))
      .toMap
    // the read-back MapState equals the per-(user, type) aggregate of
    // everything fed so far — exactly what the processor would publish if
    // its flush timer fired at this instant
    assert(state === Map(
      (7L, "view") -> ((2L, 3.5)),
      (7L, "click") -> ((1L, 3.0)),
      (8L, "view") -> ((1L, 5.0))))

    // the companion ValueState (the flush timer's superseding register)
    // reads back per user as last-seen + flushGap (1 h default)
    val tmrs = spark.read.format("statestore")
      .option("stateVarName", "tmr")
      .load(ckpt)
      .collect()
      .map(r => r.getStruct(0).getLong(0) -> r.getStruct(1).getLong(0))
      .toMap
    assert(tmrs === Map(
      7L -> (t("2024-01-10 12:20:00").getTime + 3600000L),
      8L -> (t("2024-01-10 12:30:00").getTime + 3600000L)))
  }
}
