package graft

import java.sql.Timestamp
import graft.operators.Streaming
import graft.operators.Streaming.SessEv

/** Streaming.timedSessions — timeout-finalized sessionization on Spark 4's
  * transformWithState (event-time timers + two named state variables,
  * RocksDB state store). Pins: in-batch gap closes a session inline; the
  * event-time TIMER closes the trailing session once the watermark passes
  * last + gap; the `next_sid` state variable keeps per-user numbering
  * continuous across timer closes; an open session is never emitted. */
class StatefulSessionSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  test("trailingFeatures: ListState ring buffer carries across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.TrailEv
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TrailEv]
    val q = Streaming.trailingFeatures(in.toDS().toDF(), n = 3)
      .writeStream.outputMode("append").format("memory").queryName("trail")
      .start()
    try {
      def byEv() = spark.table("trail").collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
      in.addData(Seq(
        TrailEv(7L, 1L, t("2024-01-10 12:00:00"), 1.0),
        TrailEv(7L, 2L, t("2024-01-10 12:01:00"), 2.0),
        TrailEv(7L, 3L, t("2024-01-10 12:02:00"), 3.0)))
      q.processAllAvailable()
      assert(byEv() === Map(1L -> ((1L, 1.0)), 2L -> ((2L, 1.5)), 3L -> ((3L, 2.0))))
      // batch 2: the buffer (1,2,3) carried in ListState; n=3 truncates
      in.addData(Seq(TrailEv(7L, 4L, t("2024-01-10 12:03:00"), 4.0)))
      q.processAllAvailable()
      assert(byEv()(4L) === ((3L, 3.0)), "trailing-3 of (2,3,4) across batches")
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("trailingFeatures: cleanup timer evicts a gone-quiet user; next event restarts fresh") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.TrailEv
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TrailEv]
    // horizon 10 min: user 7's buffer must be evicted once the watermark
    // passes last_event + 10 min
    val q = Streaming.trailingFeatures(in.toDS().toDF(), n = 3,
        horizonMs = 600000L)
      .writeStream.outputMode("append").format("memory").queryName("trail_ev")
      .start()
    try {
      def byEv() = spark.table("trail_ev").collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
      in.addData(Seq(
        TrailEv(7L, 1L, t("2024-01-10 12:00:00"), 2.0),
        TrailEv(7L, 2L, t("2024-01-10 12:01:00"), 4.0)))
      q.processAllAvailable()
      assert(byEv() === Map(1L -> ((1L, 2.0)), 2L -> ((2L, 3.0))))
      // advancer batches: watermark moves past 12:11 (last + horizon), the
      // cleanup timer fires with NO output rows (eviction is silent)
      in.addData(Seq(TrailEv(99L, 3L, t("2024-01-10 13:00:00"), 0.0)))
      q.processAllAvailable()
      in.addData(Seq(TrailEv(99L, 4L, t("2024-01-10 13:01:00"), 0.0)))
      q.processAllAvailable()
      // user 7 returns AFTER eviction: the window restarts at trail_n=1 —
      // the previous (2.0, 4.0) tail is gone, not averaged in
      in.addData(Seq(TrailEv(7L, 5L, t("2024-01-10 13:30:00"), 10.0)))
      q.processAllAvailable()
      assert(byEv()(5L) === ((1L, 10.0)),
        "evicted user's next event starts a fresh window")
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("trailingFeatures: gap >= horizon restarts the window even before any eviction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.TrailEv
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TrailEv]
    val q = Streaming.trailingFeatures(in.toDS().toDF(), n = 3,
        horizonMs = 600000L)
      .writeStream.outputMode("append").format("memory").queryName("trail_gap")
      .start()
    try {
      def byEv() = spark.table("trail_gap").collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
      // ONE batch: 12:00, 12:01, then a 29-min gap to 12:30 — no timer can
      // have fired (same micro-batch), yet the window must restart: the
      // horizon cutoff is semantic, not an eviction race
      in.addData(Seq(
        TrailEv(7L, 1L, t("2024-01-10 12:00:00"), 2.0),
        TrailEv(7L, 2L, t("2024-01-10 12:01:00"), 4.0),
        TrailEv(7L, 3L, t("2024-01-10 12:30:00"), 10.0)))
      q.processAllAvailable()
      assert(byEv()(3L) === ((1L, 10.0)),
        "in-batch gap >= horizon restarts at trail_n=1")
      // next batch continues the NEW segment (buffer holds only the 10.0)
      in.addData(Seq(TrailEv(7L, 4L, t("2024-01-10 12:31:00"), 20.0)))
      q.processAllAvailable()
      assert(byEv()(4L) === ((2L, 15.0)), "new segment carries across batches")
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("trailingFeatures: cross-batch out-of-order arrival is dropped, not folded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.TrailEv
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TrailEv]
    // generous 2 h watermark delay: the regressed event below PASSES the
    // source lateness filter, so it is the processor's own tail guard
    // (not Spark's watermark drop) being pinned here
    val q = Streaming.trailingFeatures(in.toDS().toDF(), n = 3,
        watermark = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("trail_late")
      .start()
    try {
      def ids() = spark.table("trail_late").collect().map(_.getLong(1)).toSet
      def byEv() = spark.table("trail_late").collect()
        .map(r => r.getLong(1) -> ((r.getLong(3), r.getDouble(4)))).toMap
      in.addData(Seq(
        TrailEv(7L, 1L, t("2024-01-10 12:00:00"), 2.0),
        TrailEv(7L, 2L, t("2024-01-10 12:01:00"), 4.0)))
      q.processAllAvailable()
      // batch 2: 11:30 is behind the buffer tail (12:01) — its true window
      // position was already emitted past; contract says DROP
      in.addData(Seq(TrailEv(7L, 3L, t("2024-01-10 11:30:00"), 100.0)))
      q.processAllAvailable()
      assert(!ids().contains(3L), "regressed arrival must not emit")
      // and it must not have contaminated the buffer either
      in.addData(Seq(TrailEv(7L, 4L, t("2024-01-10 12:30:00"), 6.0)))
      q.processAllAvailable()
      assert(byEv()(4L) === ((3L, 4.0)), "window is (2,4,6) — no 100 folded in")
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("userProfiles: MapState accumulates per type; flush timer publishes and resets") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.ProfEv
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[ProfEv]
    val q = Streaming.userProfiles(in.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("uprof")
      .start()
    try {
      def rows() = spark.table("uprof").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      in.addData(Seq(
        ProfEv(7L, "view", t("2024-01-10 12:00:00"), 1.0),
        ProfEv(7L, "click", t("2024-01-10 12:10:00"), 2.0),
        ProfEv(7L, "view", t("2024-01-10 12:20:00"), 3.0),
        ProfEv(8L, "view", t("2024-01-20 00:00:00"), 5.0))) // advancer
      q.processAllAvailable()
      // watermark Jan 19 23:59 passes user 7's flush (last + 1 h): the
      // whole per-type map publishes at once; user 8's stays pending
      assert(rows() === Set((7L, "view", 2L, 4.0), (7L, "click", 1L, 2.0)))
      // after the flush the map is CLEARED: a returning user starts fresh
      in.addData(Seq(ProfEv(7L, "view", t("2024-01-21 08:00:00"), 5.0)))
      q.processAllAvailable()
      in.addData(Seq(ProfEv(8L, "x", t("2024-01-25 00:00:00"), 0.0)))
      q.processAllAvailable()
      assert(rows().contains((7L, "view", 1L, 5.0)),
        "post-flush profile restarts from empty")
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("userProfiles multi-flush: each quiet horizon publishes its own snapshot; the timer re-registers after every flush") {
    // the PERIODIC-flush contract (q161 pins the single-flush feed by
    // design; this pins the operationally-right multi-flush behavior a
    // long-lived stream sees): a user active in three bursts, each quiet
    // gap WITNESSED by the ratcheting watermark (other traffic advances
    // it between bursts, as a real stream's does), publishes THREE
    // per-horizon snapshots, each covering only its own burst — the
    // flush clears the map, and the timer re-registered by the next
    // burst fires again. Horizons are watermark-witnessed, not
    // event-time-only: within a burst, later batches SUPERSEDE the
    // pending timer (asserted), so an unwitnessed gap merges into the
    // next horizon instead of publishing late
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.ProfEv
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[ProfEv]
    val q = Streaming.userProfiles(in.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("uprof_multi")
      .start()
    try {
      // user 7's snapshots as a SEQUENCE of emitted rows — the same
      // (user, type) legitimately recurs across horizons, so a Set
      // comparison would mask double or missing flushes
      def rows() = spark.table("uprof_multi").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq.filter(_._1 == 7L).sorted
      // burst 1 spans TWO batches 30 min apart (inside the 1 h gap): the
      // second batch must supersede the first batch's timer — no flush
      in.addData(Seq(ProfEv(7L, "view", t("2024-01-10 12:00:00"), 1.0)))
      q.processAllAvailable()
      in.addData(Seq(ProfEv(7L, "click", t("2024-01-10 12:30:00"), 2.0)))
      q.processAllAvailable()
      assert(rows().isEmpty, "flush fired inside an active burst")
      // other traffic ratchets the watermark past burst 1's horizon
      // (13:30): snapshot 1 publishes and the map clears
      in.addData(Seq(ProfEv(8L, "x", t("2024-01-10 18:00:00"), 0.0)))
      q.processAllAvailable()
      assert(rows() === Seq((7L, "click", 1L, 2.0), (7L, "view", 1L, 1.0)))
      // burst 2: accumulates fresh (no new user-7 emission yet)
      in.addData(Seq(ProfEv(7L, "view", t("2024-01-11 09:00:00"), 7.0)))
      q.processAllAvailable()
      assert(rows().size === 2, "burst 2 emitted before its horizon closed")
      // ratchet past burst 2's horizon: snapshot 2 is burst 2 ALONE —
      // the re-registered timer fired and the cleared map held only 7.0
      in.addData(Seq(ProfEv(8L, "x", t("2024-01-11 12:00:00"), 0.0)))
      q.processAllAvailable()
      assert(rows() === Seq((7L, "click", 1L, 2.0),
        (7L, "view", 1L, 1.0), (7L, "view", 1L, 7.0)))
      // burst 3 (two events, one batch), then a far-future ratchet:
      // snapshot 3 aggregates exactly the burst-3 events
      in.addData(Seq(ProfEv(7L, "view", t("2024-01-12 15:00:00"), 9.0),
        ProfEv(7L, "view", t("2024-01-12 15:10:00"), 1.0)))
      q.processAllAvailable()
      in.addData(Seq(ProfEv(8L, "x", t("2024-02-01 00:00:00"), 0.0)))
      q.processAllAvailable()
      assert(rows() === Seq((7L, "click", 1L, 2.0),
        (7L, "view", 1L, 1.0), (7L, "view", 1L, 7.0), (7L, "view", 2L, 10.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("userProfiles flush boundary: a timer fires when expiry EQUALS the watermark") {
    // pins the comparator the q177 oracle's horizon segmentation mirrors
    // (flush ⇔ lms + gap <= watermark): u7's timer expires at exactly
    // 13:00:00; an advancer putting the watermark at exactly 13:00:00
    // (13:01:00 − the 1-minute delay) fires it — the INCLUSIVE boundary
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.ProfEv
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[ProfEv]
    val q = Streaming.userProfiles(in.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("uprof_bnd")
      .start()
    try {
      def got() = spark.table("uprof_bnd").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      in.addData(Seq(ProfEv(7L, "view", t("2024-01-10 12:00:00"), 1.0)))
      q.processAllAvailable()
      // one second SHY of the boundary: no flush yet (12:59:59 < 13:00:00)
      in.addData(Seq(ProfEv(8L, "x", t("2024-01-10 13:00:59"), 0.0)))
      q.processAllAvailable()
      assert(got() === Set.empty, "watermark below expiry must not flush")
      in.addData(Seq(ProfEv(8L, "y", t("2024-01-10 13:01:00"), 0.0)))
      q.processAllAvailable()
      assert(got() === Set((7L, "view")), "expiry == watermark must flush (<=)")
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("userProfilesBootstrapped: initial state seeds the map; history-only users flush") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Streaming.ProfEv
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // history: user 7 has 2 views (sum 3.0); user 9 appears ONLY here
    val history = Seq(
      ProfEv(7L, "view", t("2024-01-10 10:00:00"), 1.0),
      ProfEv(7L, "view", t("2024-01-10 11:00:00"), 2.0),
      ProfEv(9L, "click", t("2024-01-10 09:00:00"), 9.0)).toDF()
    val in = MemoryStream[ProfEv]
    val q = Streaming.userProfilesBootstrapped(history, in.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("bprof")
      .start()
    try {
      def rows() = spark.table("bprof").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      in.addData(Seq(
        ProfEv(7L, "view", t("2024-01-10 12:00:00"), 4.0), // continues history
        ProfEv(10L, "view", t("2024-01-10 12:00:00"), 5.0), // live-only user
        ProfEv(8L, "x", t("2024-01-20 00:00:00"), 0.0)))   // advancer
      q.processAllAvailable()
      // user 7: 2 bootstrapped + 1 live = 3 views summing 7.0; user 9's
      // history-only profile flushes off the timer handleInitialState set
      assert(rows() === Set(
        (7L, "view", 3L, 7.0), (9L, "click", 1L, 9.0), (10L, "view", 1L, 5.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("in-batch close, timer close on watermark, sid continuity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prevProvider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[SessEv]
    val q = Streaming.timedSessions(in.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("tsess")
      .start()
    try {
      def rows() = spark.table("tsess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).toSet
      in.addData(Seq(
        SessEv(7L, 1L, t("2024-01-10 12:00:00"), 1.0),
        SessEv(7L, 2L, t("2024-01-10 12:02:00"), 2.0),
        SessEv(7L, 3L, t("2024-01-10 12:20:00"), 3.0), // 18 min gap: new session
        SessEv(8L, 9L, t("2024-01-20 00:00:00"), 5.0))) // watermark advancer
      q.processAllAvailable()
      val ms0 = t("2024-01-10 12:00:00").getTime
      val s1 = (7L, 1L, 2L, ms0, ms0 + 120000L, 3.0)
      val ms2 = t("2024-01-10 12:20:00").getTime
      val s2 = (7L, 2L, 1L, ms2, ms2, 3.0)
      // s1 closes INLINE (the 18-min gap inside the batch); s2 closes by
      // TIMER in the no-data micro-batch Spark runs once the watermark
      // (Jan 19 23:59, from the advancer) has passed s2's last + gap.
      // User 8's own session stays open — never emitted.
      assert(rows() === Set(s1, s2),
        "inline gap close + timer close; open sessions never emit")
      // user 7 returns much later: numbering continues at 3 (next_sid
      // survived the timer close); a far advancer closes it via timer
      in.addData(Seq(SessEv(7L, 11L, t("2024-01-21 08:00:00"), 4.0)))
      q.processAllAvailable()
      // the Jan-21 watermark also passes user 8's Jan-20 timer — that
      // session closes too; user 7's NEW session stays open
      val ms8 = t("2024-01-20 00:00:00").getTime
      val u8 = (8L, 1L, 1L, ms8, ms8, 5.0)
      assert(rows() === Set(s1, s2, u8), "user 7's new session still open")
      in.addData(Seq(SessEv(8L, 12L, t("2024-01-25 00:00:00"), 5.0)))
      q.processAllAvailable()
      val ms3 = t("2024-01-21 08:00:00").getTime
      val s3 = (7L, 3L, 1L, ms3, ms3, 4.0)
      assert(rows() === Set(s1, s2, u8, s3), "sid continuity across timer closes")
    } finally {
      q.stop()
      if (prevProvider.isEmpty)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      else spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }
}
