package graft

import graft.operators.{Knn, TopK}

class TopKSpec extends SparkSpec {

  test("aggregator top-k equals window top-k exactly") {
    val pts = Tables.points(spark, sf0)
    val qs = Tables.queryPoints(spark, sf0)
    val win = Knn.knnExact(pts, qs, 10)
    val agg = TopK.knnExactAgg(spark, pts, qs, 10)
    assert(agg.count() === win.count())
    assert(agg.except(win).count() === 0)
    assert(win.except(agg).count() === 0)
  }
}
