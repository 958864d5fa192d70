package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Streaming

/** CHECKPOINT RECOVERY — the exactly-once property a production pipeline
  * actually relies on, per state shape (dedup ValueState-per-key, session
  * ValueState + timers + sid counter, profile MapState + flush timer):
  * a query is stopped after batch k (the "kill": the query object is
  * discarded; state survives only in the RocksDB checkpoint), restarted
  * from the same checkpoint against later-arriving feed files, and the
  * final sink must hold exactly the batch-oracle rows — nothing lost
  * (restored state continues open sessions / profiles), nothing doubled
  * (restored dedup keys still suppress re-deliveries; a further restart
  * with no new data must not re-emit). File feeds + explicit mtime
  * stamps (SparkEntry.stampBatch) make the batch boundary — and hence
  * the kill point — deterministic. */
class StreamRecoverySpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  private def withRocks(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Run `pipe` over $base/feed into $base/out until idle, then stop —
    * one "lifetime" of the query; state persists in $base/ckpt. */
  private def runLifetime(base: String, schema: org.apache.spark.sql.types.StructType)
      (pipe: DataFrame => DataFrame): Unit = {
    val q = pipe(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$base/feed"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("dedup: restored key state suppresses a post-restart re-delivery; idle restart re-emits nothing") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_recov_dedup").toString
    val sch = Seq((1L, 10L, t("2024-01-10 12:00:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value").schema
    // phase 1 (two files = two micro-batches, then the kill)
    Seq((1L, 10L, t("2024-01-10 12:00:00"), 1.0),
        (2L, 10L, t("2024-01-10 12:01:00"), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$base/feed")
    val b0 = SparkEntry.stampBatch(s"$base/feed", Set.empty, 0)
    Seq((3L, 11L, t("2024-01-10 12:02:00"), 3.0))
      .toDF("event_id", "user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(s"$base/feed")
    val b1 = SparkEntry.stampBatch(s"$base/feed", b0, 1)
    withRocks {
      runLifetime(base, sch)(f =>
        Streaming.dedupWithinWatermark(f, keys = Seq("event_id")))
      // phase 2: a re-delivery of event 2 and a genuinely new event 4
      // arrive AFTER the restart — only the checkpoint knows 2 was seen
      Seq((2L, 10L, t("2024-01-10 12:01:00"), 2.0),
          (4L, 11L, t("2024-01-10 12:03:00"), 4.0))
        .toDF("event_id", "user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(s"$base/feed")
      SparkEntry.stampBatch(s"$base/feed", b1, 2)
      runLifetime(base, sch)(f =>
        Streaming.dedupWithinWatermark(f, keys = Seq("event_id")))
      val got = spark.read.parquet(s"$base/out")
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 4L),
        "batch oracle: every original exactly once, the re-delivery gone")
      // third lifetime with NO new data: the sink must not change (no
      // batch replay past the committed offset, no double-emission)
      runLifetime(base, sch)(f =>
        Streaming.dedupWithinWatermark(f, keys = Seq("event_id")))
      assert(spark.read.parquet(s"$base/out").count() === 4L)
    }
  }

  test("sessions: an OPEN session and the sid counter survive the restart") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_recov_sess").toString
    val sch = Seq((10L, 1L, t("2024-01-10 12:00:00"), 1.0))
      .toDF("user_id", "event_id", "ts", "value").schema
    // phase 1: session 1 closes IN-BATCH (9-min gap), session 2 opens at
    // 12:10 and is still open at the kill
    Seq((7L, 1L, t("2024-01-10 12:00:00"), 1.0),
        (7L, 2L, t("2024-01-10 12:01:00"), 2.0),
        (7L, 3L, t("2024-01-10 12:10:00"), 4.0))
      .toDF("user_id", "event_id", "ts", "value")
      .coalesce(1).write.parquet(s"$base/feed")
    val b0 = SparkEntry.stampBatch(s"$base/feed", Set.empty, 0)
    withRocks {
      runLifetime(base, sch)(Streaming.timedSessions(_).toDF())
      // the kill: only session 1 is in the sink; session 2 lives in state
      assert(spark.read.parquet(s"$base/out").count() === 1L)
      // phase 2: 12:11 must CONTINUE session 2 (restored ValueState);
      // 12:30 closes it in-batch and opens session 3; the sentinel's
      // watermark closes session 3 via the restored-timer machinery
      Seq((7L, 4L, t("2024-01-10 12:11:00"), 8.0),
          (7L, 5L, t("2024-01-10 12:30:00"), 16.0),
          (-1L, 6L, t("2030-01-01 00:00:00"), 0.0))
        .toDF("user_id", "event_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(s"$base/feed")
      SparkEntry.stampBatch(s"$base/feed", b0, 1)
      runLifetime(base, sch)(Streaming.timedSessions(_).toDF())
      val got = spark.read.parquet(s"$base/out")
        .where(col("user_id") >= 0)
        .orderBy("session_id")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(5)))
        .toSeq
      // batch oracle over ALL events: (sid, n_events, sum_value)
      assert(got === Seq((1L, 2L, 3.0), (2L, 2L, 12.0), (3L, 1L, 16.0)),
        "open session continued across restart; sid numbering continuous")
    }
  }

  test("profiles: MapState accumulators survive the restart and flush once, complete") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_recov_prof").toString
    val sch = Seq((10L, "a", t("2024-01-10 12:00:00"), 1.0))
      .toDF("user_id", "event_type", "ts", "value").schema
    // phase 1: two type-a events accumulate, nothing flushes (the 1 h
    // flush gap never elapses before the kill)
    Seq((7L, "a", t("2024-01-10 12:00:00"), 1.0),
        (7L, "a", t("2024-01-10 12:10:00"), 2.0))
      .toDF("user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$base/feed")
    val b0 = SparkEntry.stampBatch(s"$base/feed", Set.empty, 0)
    withRocks {
      runLifetime(base, sch)(Streaming.userProfiles(_).toDF())
      assert(spark.read.parquet(s"$base/out").count() === 0L,
        "nothing may flush before the kill")
      // phase 2: more of type a, a first type b, then the sentinel whose
      // watermark fires the flush timer — the published profile must
      // count BOTH phases (restored MapState), exactly once
      Seq((7L, "a", t("2024-01-10 12:20:00"), 4.0),
          (7L, "b", t("2024-01-10 12:25:00"), 8.0),
          (-1L, "x", t("2030-01-01 00:00:00"), 0.0))
        .toDF("user_id", "event_type", "ts", "value")
        .coalesce(1).write.mode("append").parquet(s"$base/feed")
      SparkEntry.stampBatch(s"$base/feed", b0, 1)
      runLifetime(base, sch)(Streaming.userProfiles(_).toDF())
      val got = spark.read.parquet(s"$base/out")
        .where(col("user_id") >= 0)
        .orderBy("event_type")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(got === Seq(("a", 3L, 7.0), ("b", 1L, 8.0)),
        "profile = batch aggregate over both lifetimes, flushed once")
    }
  }
}
