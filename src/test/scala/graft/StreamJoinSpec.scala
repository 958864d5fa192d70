package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Streaming

/** Event rows for the attribution-join stream tests (top-level for the
  * case-class Encoder). */
final case class AttrEv(event_id: Long, user_id: Long, ts: Timestamp)

/** Streaming.attributionJoin — the watermarked stream-stream interval
  * join. One definition serves batch (the oracle form) and streaming;
  * these pin (a) the batch semantics, (b) batch/stream row parity on the
  * same data, and (c) REAL watermark behavior: a pair arriving later than
  * the event-time watermark is dropped from the stream result while the
  * batch twin (which has no lateness) still contains it. */
class StreamJoinSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    // joined: click 1 h after the view, same user
    AttrEv(1L, 7L, t("2024-01-10 12:00:00")), // view V1
    // watermark advancers on both sides (also a valid pair themselves)
    AttrEv(9L, 8L, t("2024-01-20 00:00:00"))) // view V9
  private val clicks1 = Seq(
    AttrEv(101L, 7L, t("2024-01-10 13:00:00")), // click C1 -> V1
    AttrEv(109L, 8L, t("2024-01-20 01:00:00"))) // click C9 -> V9
  // a pair 9+ days older than the advanced watermark: late in streaming
  private val views2 = Seq(AttrEv(2L, 7L, t("2024-01-10 14:00:00")))
  private val clicks2 = Seq(AttrEv(102L, 7L, t("2024-01-10 15:00:00")))

  private def toDf(rows: Seq[AttrEv]) = {
    import spark.implicits._
    rows.toDF()
  }

  test("batch form: strict (view, view+6h] window per user, exact delta_ms") {
    val out = Streaming.attributionJoin(
        toDf(batch1 ++ views2), toDf(clicks1 ++ clicks2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(
      (1L, 101L, 7L, 3600000L),  // V1 -> C1, 1 h
      (1L, 102L, 7L, 10800000L), // V1 -> C2, 3 h
      (2L, 102L, 7L, 3600000L),  // V2 -> C2, 1 h
      (9L, 109L, 8L, 3600000L))) // V9 -> C9, 1 h
    // NOT joined: cross-user, click-before-view, > 6 h — all absent above
  }

  test("stream == batch on punctual data; late pair dropped by the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val vIn = MemoryStream[AttrEv]
    val cIn = MemoryStream[AttrEv]
    val q = Streaming.attributionJoin(vIn.toDS().toDF(), cIn.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("attrib")
      .start()
    try {
      vIn.addData(batch1); cIn.addData(clicks1)
      q.processAllAvailable()
      val afterB1 = spark.table("attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // punctual pairs match the batch twin restricted to batch-1 rows
      assert(afterB1 === Set((1L, 101L), (9L, 109L)))
      // batch 1 advanced both event-time watermarks to ~Jan 19 (max ts -
      // 1 day); batch 2's Jan 10 pair is behind the watermark -> DROPPED
      vIn.addData(views2); cIn.addData(clicks2)
      q.processAllAvailable()
      val afterB2 = spark.table("attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB2 === afterB1,
        "late-beyond-watermark pair must not join in the stream")
      // ...while the batch twin on the SAME rows still contains it — the
      // difference IS the watermark contract, not a correctness gap
      val batchAll = Streaming.attributionJoin(
          toDf(batch1 ++ views2), toDf(clicks1 ++ clicks2))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchAll.contains((2L, 102L)))
    } finally q.stop()
  }

  test("left outer: null pad emits only once the watermark proves no match can come") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val vIn = MemoryStream[AttrEv]
    val cIn = MemoryStream[AttrEv]
    val q = Streaming.attributionJoin(vIn.toDS().toDF(), cIn.toDS().toDF(),
        joinType = "left_outer")
      .writeStream.outputMode("append").format("memory").queryName("attrib_out")
      .start()
    try {
      def rows() = spark.table("attrib_out").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // batch 1: one never-converting view, click side silent — the join
      // cannot yet prove no click will come, so NOTHING emits (the timing
      // half of the outer-join contract: no premature null pad)
      vIn.addData(Seq(AttrEv(1L, 7L, t("2024-01-10 12:00:00"))))
      q.processAllAvailable()
      assert(rows() === Set.empty,
        "open view must not null-emit before its window is watermark-closed")
      // batch 2: advancers on BOTH sides (also a valid inner pair). The
      // global watermark moves past V1.ts + 6 h + delay, V1's state is
      // evicted, and the eviction IS the null-padded emission
      vIn.addData(Seq(AttrEv(9L, 8L, t("2024-01-20 00:00:00"))))
      cIn.addData(Seq(AttrEv(109L, 8L, t("2024-01-20 01:00:00"))))
      q.processAllAvailable()
      assert(rows() === Set((1L, -1L), (9L, 109L)),
        "watermark-closed unmatched view emits exactly once, null-padded")
      // the null row carries a null delta_ms too (both padded columns)
      val pad = spark.table("attrib_out").collect().find(_.getLong(0) == 1L).get
      assert(pad.isNullAt(1) && pad.isNullAt(3))
    } finally q.stop()
  }
}
