package graft

import java.sql.Timestamp
import graft.operators.Streaming

/** Event rows for the streaming-dedup tests (top-level for the
  * case-class Encoder). */
final case class DedupEv(event_id: Long, user_id: Long, ts: Timestamp)

/** Streaming.dedupWithinWatermark — exact dedup under at-least-once
  * delivery. One definition serves batch (the oracle form: plain
  * dropDuplicates) and streaming (dropDuplicatesWithinWatermark with
  * bounded keyed state). These pin (a) batch semantics, (b) CROSS-batch
  * suppression — a re-delivery in a later micro-batch must hit carried
  * state, and (c) the horizon contract: a re-delivery arriving BEHIND
  * the watermark is discarded as late data before it ever reaches the
  * dedup state — so exactly-once output holds for any re-delivery, and
  * the price of bounded state is paid in the general lateness rule, not
  * in duplicate leakage. */
class StreamDedupSpec extends SparkSpec {
  private def t(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    DedupEv(1L, 7L, t("2024-01-10 12:00:00")),
    DedupEv(2L, 7L, t("2024-01-10 12:05:00")),
    DedupEv(2L, 7L, t("2024-01-10 12:05:00")), // same-batch dup
    DedupEv(9L, 8L, t("2024-01-20 00:00:00"))) // watermark advancer

  test("batch form: one row per key") {
    import spark.implicits._
    val out = Streaming.dedupWithinWatermark(batch1.toDF(), Seq("event_id"))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 9L))
  }

  test("stream: cross-batch dup suppressed; beyond-horizon dup re-emitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[DedupEv]
    val q = Streaming.dedupWithinWatermark(in.toDS().toDF(), Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("sdedup")
      .start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      def ids() = spark.table("sdedup").collect().map(_.getLong(0)).toSeq
      assert(ids().sorted === Seq(1L, 2L, 9L), "same-batch dup must collapse")
      // batch 1 advanced the watermark to ~Jan 19 (max ts - 1 day): key 9
      // (Jan 20) is still in state and ahead of the watermark; key 1's
      // Jan 10 timestamp is BEHIND it. A batch-2 re-delivery of 9 is
      // suppressed by carried state; the re-delivery of 1 is discarded
      // as LATE DATA before it reaches the dedup state — either way no
      // duplicate reaches the sink.
      in.addData(Seq(
        DedupEv(9L, 8L, t("2024-01-20 00:00:00")),
        DedupEv(1L, 7L, t("2024-01-10 12:00:00")),
        DedupEv(3L, 7L, t("2024-01-20 01:00:00"))))
      q.processAllAvailable()
      val got = ids()
      assert(got.count(_ == 9L) === 1, "within-horizon re-delivery must be suppressed")
      assert(got.count(_ == 3L) === 1, "new key must pass")
      assert(got.count(_ == 1L) === 1,
        "behind-watermark re-delivery is dropped as late data, not re-emitted " +
          "— bounded state never costs duplicate leakage")
    } finally q.stop()
  }
}
