package graft

import org.apache.spark.sql.functions._

/** SparkEntry.writeTimeOrderedFeed — the honest streaming-feed shape every
  * sink-backed bench run ingests (SCALE.md, "The r9 streaming-feed
  * convention"). The properties the streaming semantics arguments lean on:
  * every row lands in exactly one chunk, chunks are time-DISJOINT and
  * time-ORDERED, and the stamped mtimes make FileStreamSource's
  * maxFilesPerTrigger=1 replay them in chunk order — so no event can ever
  * arrive behind the watermark its predecessors set. */
class StreamFeedSpec extends SparkSpec {

  test("chunks cover every row once, disjoint and ordered, mtime-sequenced") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_feed").toString
    // 1000 events over an uneven span, incl. exact-boundary and max-ts rows
    val ev = (0 until 1000)
      .map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i * 777L)))
      .toDF("event_id", "ts")
    val known = SparkEntry.writeTimeOrderedFeed(ev, s"$dir/feed", files = 7)
    assert(known.size === 7)

    val parts = new java.io.File(s"$dir/feed").listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .sortBy(_.lastModified)
    assert(parts.length === 7)
    // strictly increasing stamps: batch order is a property of the artifact
    assert(parts.sliding(2).forall(p => p(0).lastModified < p(1).lastModified))

    // exactly-once coverage + per-chunk time ranges disjoint and ordered
    // in the SAME order as the mtime sequence
    val perFile = parts.map { f =>
      val rows = spark.read.schema(ev.schema).parquet(f.getAbsolutePath)
        .select(col("event_id"), unix_millis(col("ts")).as("ms"))
        .collect()
      (rows.map(_.getLong(0)).toSet, rows.map(_.getLong(1)))
    }
    val allIds = perFile.flatMap(_._1)
    assert(allIds.length === 1000 && allIds.toSet.size === 1000)
    perFile.sliding(2).foreach {
      case Array((_, a), (_, b)) if a.nonEmpty && b.nonEmpty =>
        assert(a.max < b.min, "chunk time ranges must be disjoint+ordered")
      case _ => ()
    }
  }

  test("pinned bounds align two feeds batch-for-batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_feed2").toString
    val ev = (0 until 600)
      .map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        if (i % 3 == 0) "view" else "click"))
      .toDF("event_id", "ts", "event_type")
    val mm = ev.agg(min(unix_millis(col("ts"))).as("mn"),
      max(unix_millis(col("ts"))).as("mx")).collect()(0)
    val bounds = Some((mm.getLong(0), mm.getLong(1)))
    SparkEntry.writeTimeOrderedFeed(
      ev.where(col("event_type") === "view").drop("event_type"),
      s"$dir/views", files = 5, bounds = bounds)
    SparkEntry.writeTimeOrderedFeed(
      ev.where(col("event_type") === "click").drop("event_type"),
      s"$dir/clicks", files = 5, bounds = bounds)
    def chunkOf(side: String) = {
      val parts = new java.io.File(s"$dir/$side").listFiles
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .sortBy(_.lastModified)
      parts.map(f => spark.read
        .schema("event_id LONG, ts TIMESTAMP").parquet(f.getAbsolutePath)
        .agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts"))))
        .collect()(0))
    }
    // same global boundaries: chunk k of views never overlaps chunk k+1
    // of clicks and vice versa (the batch-alignment the join feeds need)
    val (v, c) = (chunkOf("views"), chunkOf("clicks"))
    val span = mm.getLong(1) - mm.getLong(0) + 1
    for (k <- 0 until 5; r <- Seq(v(k), c(k)) if !r.isNullAt(0)) {
      val lo = mm.getLong(0) + span * k / 5
      val hi = if (k == 4) mm.getLong(1) else mm.getLong(0) + span * (k + 1) / 5 - 1
      assert(r.getLong(0) >= lo && r.getLong(1) <= hi,
        s"chunk $k strayed outside its boundary")
    }
  }
}
