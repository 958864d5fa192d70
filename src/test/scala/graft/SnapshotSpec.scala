package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    (1L, "h1"), // unchanged
    (2L, "h2a"), // changed
    (3L, "h3")) // removed
    .toDF("k", "h")
  private val neu = Seq(
    (1L, "h1"),
    (2L, "h2b"),
    (4L, "h4")) // added
    .toDF("k", "h")

  test("cdcDiff: all four statuses from presence + hash compare") {
    val got = Snapshot.cdcDiff(old, neu, "k", "h")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)),
        Option(r.getString(3))))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "unchanged", Some("h1"), Some("h1")),
      (2L, "changed", Some("h2a"), Some("h2b")),
      (3L, "removed", Some("h3"), None),
      (4L, "added", None, Some("h4"))))
  }

  test("upsertMerge: new wins per key, removed keys persist") {
    val got = Snapshot.upsertMerge(old, neu, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "h1"), (2L, "h2b"), (3L, "h3"), (4L, "h4")))
  }

  test("cdcDiff + upsertMerge compose: merged hash equals new where present") {
    // MERGE contract cross-check without DataFrame self-joins: for every
    // key the diff says exists in neu, merged carries neu's hash; for
    // 'removed' keys merged carries old's hash
    val diff = Snapshot.cdcDiff(old, neu, "k", "h")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)), Option(r.getString(3)))).toMap
    val merged = Snapshot.upsertMerge(old, neu, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    diff.foreach { case (k, (status, oldH, newH)) =>
      if (status == "removed") assert(merged(k) === oldH.get, s"key $k")
      else assert(merged(k) === newH.get, s"key $k")
    }
    assert(diff.keySet === merged.keySet)
  }
}
