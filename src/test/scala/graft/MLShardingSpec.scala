package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sharding, Streaming}

class MLShardingSpec extends SparkSpec {

  test("fitCentroidsML produces k full-dim centroids and a tighter fit than init") {
    val pts = Tables.points(spark, sf0).cache()
    val ml = Sharding.fitCentroidsML(spark, pts, k = 4, maxIter = 10)
    assert(ml.count() === 4)
    assert(ml.head().getSeq[Double](1).length === 64)
    // ML fit should not be worse than the zero-iteration init on mean distance
    val init = Sharding.initCentroids(pts, 4)
    def meanDist(c: org.apache.spark.sql.DataFrame) =
      Sharding.assign(pts, c).agg(avg("dist")).head().getDouble(0)
    assert(meanDist(ml) <= meanDist(init) + 1e-9)
  }

  test("sessionWindows agrees with lag-based sessionize on session counts") {
    val ev = Tables.events(spark, sf0)
      .withColumn("ts", timestamp_millis(unix_millis(col("ts"))))
    val sw = Streaming.sessionWindows(ev)
    val lag = Streaming.sessionize(ev)
    assert(sw.count() === lag.count())
    val a = sw.groupBy("user_id").count()
    val b = lag.groupBy("user_id").count()
    assert(a.except(b).count() === 0)
    // event conservation
    assert(sw.agg(sum("n_events")).head().getLong(0) === ev.count())
  }

  test("shardSizeHistogram buckets cover all shards") {
    val pts = Tables.points(spark, sf0)
    val cents = Sharding.fitCentroids(spark, pts, 4, 2)
    val sizes = Sharding.shardSizes(Sharding.assign(pts, cents), 100L)
    val hist = Sharding.shardSizeHistogram(sizes)
    assert(hist.agg(sum("n_shards")).head().getLong(0) === 4L)
  }

  test("centroidSpreadStats bounds: cosine in [-1, 1], median between extremes") {
    val pts = Tables.points(spark, sf0)
    val cents = Sharding.fitCentroids(spark, pts, 4, 2)
    val r = Sharding.centroidSpreadStats(cents).head()
    val (n, mn, md, mx) = (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n === 6L) // 4 choose 2
    assert(mn >= -1.0 && mx <= 1.0 && mn <= md && md <= mx)
  }
}
