package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Kanndi, Knn, Sharding, ShardedSearch}
import graft.sources.BinFormat

/** End-to-end reference-pipeline parity: a user of big-ann runs
  * E1/E2 (ingest -> shard -> persist index) then E3 (routed search ->
  * recall). This spec runs the whole flow through the engine's public API,
  * including the binary interop format and the on-disk partitioned layout.
  */
class PipelineSpec extends SparkSpec {

  test("full pipeline: fbin ingest -> kmeans shard -> partitioned write -> routed search -> recall") {
    val tmp = Files.createTempDirectory("graft-pipe").toString

    // E2 step 0: export + re-ingest through the reference's binary format
    val original = Tables.points(spark, sf0)
    BinFormat.write(original, s"$tmp/base.fbin", BinFormat.F32)
    val pts = BinFormat.read(spark, s"$tmp/base.fbin", BinFormat.F32).cache()
    assert(pts.count() === original.count())

    // E2: fit + assign + persist the shard layout (the "index build")
    val cents = Sharding.fitCentroids(spark, pts, k = 4, iters = 2)
    val assigned = Sharding.assign(pts, cents)
    Sharding.writeSharded(pts, assigned, s"$tmp/index")

    // E3: search the on-disk layout via the broadcast router
    val sharded = spark.read.parquet(s"$tmp/index")
    val qs = Tables.queryPoints(spark, sf0)
    val routed = ShardedSearch.search(sharded, qs, cents, k = 10, t = 2)
    val exact = Knn.knnExact(pts, qs, 10)
    val recall = ShardedSearch.recallAtK(exact, routed, 10).head()
      .getDouble(1)
    // T=2 of 4 shards must beat naive expectation and find every self-match
    assert(recall >= 0.5, s"recall $recall")
    val self = routed.where(col("rank") === 1 && col("qid") === col("neighbor_id"))
    assert(self.count() === qs.count())

    // KANNDI variant over the same ingested points: build + search
    val kr = Kanndi.shardAuto(spark, pts, m = 3, sampleSize = 100)
    val kSharded = pts.join(
      kr.assigned.where(col("shard_id") >= 0).select("id", "shard_id"), "id")
    val kRouted = ShardedSearch.search(kSharded, qs, kr.seeds, k = 10, t = 2)
    val kRecall = ShardedSearch.recallAtK(exact, kRouted, 10).head().getDouble(1)
    assert(kRecall > 0.0 && kRouted.count() > 0)
  }
}
