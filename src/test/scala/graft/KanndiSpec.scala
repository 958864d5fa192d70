package graft

import org.apache.spark.sql.functions._

import graft.operators.Kanndi

class KanndiSpec extends SparkSpec {
  lazy val pts = Tables.points(spark, sf0).cache()

  test("kanndi partitions every point exactly once across m shards + special") {
    val r = Kanndi.shardAuto(spark, pts, m = 4, sampleSize = 200)
    val a = r.assigned.cache()
    assert(a.count() === pts.count())
    assert(a.select("id").distinct().count() === pts.count())
    val shards = a.select("shard_id").distinct().collect().map(_.getInt(0)).toSet
    assert(shards.subsetOf(Set(0, 1, 2, 3, Kanndi.SpecialShard)))
    assert(r.seeds.count() === 4)
    // capacity respected
    val maxN = a.where(col("shard_id") >= 0).groupBy("shard_id").count()
      .agg(max("count")).head().getLong(0)
    assert(maxN <= pts.count() / 4)
  }

  test("admitted points are within d of their shard seed") {
    import graft.functions.VectorFunctions._
    val med = graft.operators.Sharding
      .medianPairwiseDist(pts, 200).collect()(0).getDouble(1)
    val r = Kanndi.shardByDistance(spark, pts, m = 3, d0 = med,
      capacity = pts.count() / 3)
    val joined = r.assigned
      .where(col("shard_id") >= 0)
      .join(pts, "id")
      .join(r.seeds, "shard_id")
      .withColumn("sd", round(l2Dist(col("vec"), col("centroid")), 4))
    assert(joined.where(col("sd") > med).count() === 0)
    // dist column is the seed distance
    assert(joined.where(col("sd") =!= col("dist")).count() === 0)
  }

  test("m=8 run preserves invariants (round-trip cost batching)") {
    val r = Kanndi.shardAuto(spark, pts, m = 8, sampleSize = 200)
    val a = r.assigned.cache()
    assert(a.count() === pts.count())
    assert(a.select("id").distinct().count() === pts.count())
    val maxN = a.where(col("shard_id") >= 0).groupBy("shard_id").count()
      .agg(max("count")).head().getLong(0)
    assert(maxN <= pts.count() / 8)
    assert(r.seeds.count() <= 8)
  }

  test("batched variant with batchSeeds=1 equals the sequential build exactly") {
    val med = graft.operators.Sharding
      .medianPairwiseDist(pts, 200).collect()(0).getDouble(1)
    val seq = Kanndi.shardByDistance(spark, pts, m = 4, d0 = med,
      capacity = pts.count() / 4)
    val bat = Kanndi.shardByDistanceBatched(spark, pts, m = 4, d0 = med,
      capacity = pts.count() / 4, batchSeeds = 1)
    assert(seq.assigned.exceptAll(bat.assigned).isEmpty &&
      bat.assigned.exceptAll(seq.assigned).isEmpty)
    assert(seq.seeds.exceptAll(bat.seeds).isEmpty)
  }

  test("batched-adaptive with batchSeeds=1 equals sequential-adaptive exactly") {
    val med = graft.operators.Sharding
      .medianPairwiseDist(pts, 200).collect()(0).getDouble(1)
    // d0 at a tenth of the median: early rounds starve and MUST escalate
    val d0 = med * 0.1
    val seq = Kanndi.shardByDistance(spark, pts, m = 4, d0 = d0,
      capacity = pts.count() / 4, adaptive = true)
    val bat = Kanndi.shardByDistanceBatched(spark, pts, m = 4, d0 = d0,
      capacity = pts.count() / 4, batchSeeds = 1, adaptive = true)
    assert(seq.assigned.exceptAll(bat.assigned).isEmpty &&
      bat.assigned.exceptAll(seq.assigned).isEmpty)
    assert(seq.seeds.exceptAll(bat.seeds).isEmpty)
    // escalation actually fired: the starved d0 still fills shards
    val filled = bat.assigned.where(col("shard_id") >= 0).count()
    assert(filled > 0L)
  }

  test("batched multi-seed build preserves invariants in ceil(m/batch) rounds") {
    val med = graft.operators.Sharding
      .medianPairwiseDist(pts, 200).collect()(0).getDouble(1)
    val r = Kanndi.shardByDistanceBatched(spark, pts, m = 8, d0 = med,
      capacity = pts.count() / 8, batchSeeds = 4)
    val a = r.assigned.cache()
    assert(a.count() === pts.count())
    assert(a.select("id").distinct().count() === pts.count())
    val maxN = a.where(col("shard_id") >= 0).groupBy("shard_id").count()
      .agg(max("count")).head().getLong(0)
    assert(maxN <= pts.count() / 8)
    // every admitted point is within d of its OWN seed
    import graft.functions.VectorFunctions._
    val joined = a.where(col("shard_id") >= 0)
      .join(pts, "id").join(r.seeds, "shard_id")
      .withColumn("sd", round(l2Dist(col("vec"), col("centroid")), 4))
    assert(joined.where(col("sd") > med).count() === 0)
  }

  test("adaptive escalation fills shards when d starts too small") {
    val tight = Kanndi.shardAuto(spark, pts, m = 4, sampleSize = 200,
      distScale = 0.05, adaptive = false)
    val loose = Kanndi.shardAuto(spark, pts, m = 4, sampleSize = 200,
      distScale = 0.05, adaptive = true)
    val leftTight = tight.assigned.where(col("shard_id") === Kanndi.SpecialShard).count()
    val leftLoose = loose.assigned.where(col("shard_id") === Kanndi.SpecialShard).count()
    assert(leftLoose < leftTight)
  }
}
