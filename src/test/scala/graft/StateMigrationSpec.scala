package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Streaming
import graft.operators.Streaming.{InitProfileV2, ProfEv}

/** OFFLINE STATE MIGRATION — the statestore ↔ bootstrap loop closed: run
  * the V1 profile pipeline (q161's processor) and kill it mid-flight;
  * read its checkpoint back as DATA through `spark.read.format
  * ("statestore")`; reshape those rows — plain DataFrame code — into the
  * initial-state shape of a MODIFIED processor whose value schema grew a
  * field (`max_value`, defaulting to unknown for pre-migration history);
  * seed the V2 pipeline via handleInitialState and stream new events on
  * top. The migration contract proven here:
  *
  *  - carried fields are EXACT: the migrated pipeline's (n_events,
  *    sum_value) equal the never-migrated batch aggregate over ALL
  *    events (history + live), computed independently in the spec;
  *  - the added field follows its default: max_value reflects only
  *    post-migration events, None when none arrived (history predates
  *    the field);
  *  - a history-only user still publishes — their flush timer is
  *    re-seeded from the V1 `tmr` state read out of the checkpoint. */
class StateMigrationSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  test("v1 checkpoint -> statestore read -> reshape -> v2 handleInitialState == batch oracle") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_migr_v1").toString
    val history = Seq(
      ProfEv(7L, "view", t("2024-01-10 12:00:00"), 1.5),
      ProfEv(7L, "view", t("2024-01-10 12:10:00"), 2.0),
      ProfEv(7L, "click", t("2024-01-10 12:20:00"), 3.0),
      ProfEv(8L, "view", t("2024-01-10 12:30:00"), 5.0))
    val live = Seq(
      ProfEv(7L, "view", t("2024-01-10 13:00:00"), 0.5),
      ProfEv(7L, "buy", t("2024-01-10 13:05:00"), 9.0),
      ProfEv(9L, "view", t("2024-01-10 13:10:00"), 2.5))
    try {
      // ---- V1 lifetime: accumulate history, no flush (1 h gap never
      // elapses), kill — the whole profile is live state in the checkpoint
      val in1 = MemoryStream[ProfEv]
      val q1 = Streaming.userProfiles(in1.toDS().toDF())
        .writeStream.outputMode("append").format("memory").queryName("mig_v1")
        .option("checkpointLocation", ckpt)
        .start()
      try { in1.addData(history); q1.processAllAvailable() } finally q1.stop()
      assert(spark.table("mig_v1").count() === 0L, "nothing flushed before the kill")

      // ---- offline reshape: checkpoint rows -> InitProfileV2 (mx starts
      // unknowable; the flush timer re-derives last_ms from V1's tmr)
      val profState = spark.read.format("statestore")
        .option("stateVarName", "profile").load(ckpt)
        .select(col("key.value").as("user_id"),
          col("user_map_key.value").as("event_type"),
          col("user_map_value.n").as("n"),
          col("user_map_value.sum").as("sum"))
      val tmrState = spark.read.format("statestore")
        .option("stateVarName", "tmr").load(ckpt)
        .select(col("key.value").as("user_id"), col("value.value").as("tmr"))
      val init = profState.join(tmrState, "user_id")
        .groupBy(col("user_id"))
        .agg(
          map_from_entries(collect_list(struct(col("event_type"),
            struct(col("n").as("n"), col("sum").as("sum"),
              lit(Double.NegativeInfinity).as("mx"))))).as("types"),
          (max(col("tmr")) - 3600000L).as("last_ms"))
        .as[InitProfileV2]

      // ---- V2 lifetime: evolved processor seeded with the reshaped
      // state; live events + a sentinel that flushes every user
      val in2 = MemoryStream[ProfEv]
      val q2 = Streaming.userProfilesMigrated(init, in2.toDS().toDF())
        .writeStream.outputMode("append").format("memory").queryName("mig_v2")
        .start()
      try {
        in2.addData(live)
        q2.processAllAvailable()
        in2.addData(Seq(ProfEv(-1L, "x", t("2030-01-01 00:00:00"), 0.0)))
        q2.processAllAvailable()
      } finally q2.stop()

      val got = spark.table("mig_v2")
        .where(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
        .toMap

      // never-migrated batch oracle for the carried fields: plain
      // aggregate over history + live, computed independently here
      val oracle = (history ++ live)
        .groupBy(e => (e.user_id, e.event_type))
        .map { case (k, es) =>
          k -> ((es.size.toLong,
            BigDecimal(es.map(_.value).sum)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      assert(got.view.mapValues(v => (v._1, v._2)).toMap === oracle,
        "migrated (n, sum) == batch aggregate over history + live")
      // the added field: max over LIVE events only; None where none came
      val liveMax = live.groupBy(e => (e.user_id, e.event_type))
        .map { case (k, es) => k -> es.map(_.value).max }
      got.foreach { case (k, (_, _, mx)) =>
        assert(mx === liveMax.get(k),
          s"$k: max_value must cover exactly the post-migration events")
      }
      // the history-only user's flush came from the re-seeded timer
      assert(got.contains((8L, "view")))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
