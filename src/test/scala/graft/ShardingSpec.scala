package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Sharding, ShardedSearch}

class ShardingSpec extends SparkSpec {
  lazy val pts = Tables.points(spark, sf0).cache()
  lazy val cents = Sharding.fitCentroids(spark, pts, k = 4, iters = 2)

  test("fitCentroids yields k centroids of full dim") {
    val c = cents.collect()
    assert(c.length === 4)
    assert(c.forall(_.getSeq[Double](1).length === 64))
  }

  test("assign covers every point exactly once") {
    val assigned = Sharding.assign(pts, cents)
    assert(assigned.count() === pts.count())
    assert(assigned.select("id").distinct().count() === pts.count())
    val sizes = Sharding.shardSizes(assigned, expectedShardSize = 100L)
    assert(sizes.agg(sum("n")).head().getLong(0) === pts.count())
  }

  test("assignLit (map-only literal) is row-identical to assign") {
    val centArr = cents.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val rel = Sharding.assign(pts, cents)
    val lit = Sharding.assignLit(pts, centArr)
    assert(lit.except(rel).count() === 0)
    assert(rel.except(lit).count() === 0)
    // keepVec carries the vector through unchanged
    val withVec = Sharding.assignLit(pts, centArr, keepVec = true)
    assert(withVec.columns.toSeq === Seq("id", "shard_id", "dist", "vec"))
    assert(withVec.select("id", "shard_id", "dist").except(rel).count() === 0)
  }

  test("assignLit loop kernel (k > 16) is row-identical to assign") {
    // 20 centroids forces the NearestCentroid loop-codegen path (the
    // unrolled candidate array overflows janino around k≈80; the spec
    // pins semantic parity at a size both forms can run)
    val cents20 = Sharding.fitCentroids(spark, pts, k = 20, iters = 1)
    val centArr = cents20.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    assert(centArr.length === 20)
    val rel = Sharding.assign(pts, cents20)
    val loop = Sharding.assignLit(pts, centArr)
    assert(loop.except(rel).count() === 0)
    assert(rel.except(loop).count() === 0)
  }

  test("assignment is to the truly nearest centroid (rounded ranking)") {
    val assigned = Sharding.assign(pts, cents)
    // brute-force check on a few points
    import graft.functions.VectorFunctions._
    val all = pts
      .join(broadcast(cents))
      .select(col("id"), col("shard_id"), round(l2Dist(col("vec"), col("centroid")), 4).as("d"))
      .groupBy("id")
      .agg(min(col("d")).as("best"))
    val joined = assigned.join(all, "id").where(col("dist") =!= col("best"))
    assert(joined.count() === 0)
  }

  test("writeSharded produces a partition-pruned layout matching assignment") {
    val dir = Files.createTempDirectory("graft-sharded").toString
    val assigned = Sharding.assign(pts, cents)
    Sharding.writeSharded(pts, assigned, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === pts.count())
    val s0count = assigned.where(col("shard_id") === 0).count()
    val pruned = back.where(col("shard_id") === 0)
    assert(pruned.count() === s0count)
    // partition pruning visible in the physical plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("shard_id = 0"))
  }

  test("route returns t shards per query; searchSharded recall 1.0 when T=k shards") {
    val qs = Tables.queryPoints(spark, sf0)
    val routes = ShardedSearch.route(qs, cents, t = 2)
    val perQ = routes.groupBy("qid").count().agg(min("count"), max("count")).head()
    assert(perQ.getLong(0) === 2 && perQ.getLong(1) === 2)
    // probing ALL shards must reproduce the exact result
    val sharded = pts.join(Sharding.assign(pts, cents).select("id", "shard_id"), "id")
    val full = ShardedSearch.search(sharded, qs, cents, k = 10, t = 4)
    val exact = Knn.knnExact(pts, qs, 10)
    val rec = ShardedSearch.recallAtK(exact, full, 10).head()
    assert(rec.getDouble(rec.fieldIndex("recall")) === 1.0)
  }

  test("searchSweep per-t slices are row-identical to independent searches") {
    val qs = Tables.queryPoints(spark, sf0)
    val sharded = pts.join(Sharding.assign(pts, cents).select("id", "shard_id"), "id")
    val sweep = ShardedSearch.searchSweep(sharded, qs, cents, k = 10, maxT = 3)
      .cache()
    for (t <- 1 to 3) {
      val slice = sweep.where(col("t") === t.toLong)
        .select("qid", "rank", "neighbor_id", "dist")
      val indep = ShardedSearch.search(sharded, qs, cents, k = 10, t = t)
        .select("qid", "rank", "neighbor_id", "dist")
      assert(slice.exceptAll(indep).isEmpty && indep.exceptAll(slice).isEmpty,
        s"t=$t")
    }
    sweep.unpersist()
  }

  test("searchAgg (heap aggregator) is row-identical to the window search") {
    val qs = Tables.queryPoints(spark, sf0)
    val sharded = pts.join(Sharding.assign(pts, cents).select("id", "shard_id"), "id")
    val win = ShardedSearch.search(sharded, qs, cents, k = 10, t = 2)
    val agg = ShardedSearch.searchAgg(spark, sharded, qs, cents, k = 10, t = 2)
    assert(win.exceptAll(agg).isEmpty && agg.exceptAll(win).isEmpty)
  }

  test("bucketed-by-id layout joins exchange-free") {
    // clean both catalog entries AND orphan warehouse dirs from prior JVMs
    for (t <- Seq("pts_bkt_a", "pts_bkt_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(loc)
      }
    }
    Sharding.writeBucketedById(pts, "pts_bkt_a", 4)
    Sharding.writeBucketedById(pts.select(col("id"), col("vec").as("vec2")), "pts_bkt_b", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("pts_bkt_a").join(spark.table("pts_bkt_b"), "id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(j.count() === pts.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("medianPairwiseDist matches a hand-computed tiny case") {
    import spark.implicits._
    // 3 points on a line: distances 1, 2, 3 -> median 2
    val tiny = Seq(
      (0L, Array(0f)), (1L, Array(1f)), (2L, Array(3f))
    ).toDF("id", "vec")
    val r = Sharding.medianPairwiseDist(tiny, sampleSize = 3).head()
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 2.0)
  }
}
