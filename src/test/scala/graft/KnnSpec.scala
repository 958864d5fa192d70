package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

class KnnSpec extends SparkSpec {

  test("knnExact returns k ascending neighbors per query, self first") {
    val res = Knn
      .knnExact(Tables.points(spark, sf0), Tables.queryPoints(spark, sf0), k = 10)
      .cache()
    val qids = Tables.queryPoints(spark, sf0).count()
    assert(res.count() === qids * 10)
    // every query's rank-1 neighbor is itself at distance 0 (query set is a
    // stride of the points)
    val r1 = res.where(col("rank") === 1)
    assert(r1.where(col("qid") === col("neighbor_id")).count() === qids)
    assert(r1.agg(max(col("dist"))).head().getDouble(0) === 0.0)
    // distances nondecreasing in rank
    val bad = res
      .groupBy(col("qid"))
      .agg(
        max(struct(col("rank"), col("dist"))).getField("dist").as("last"),
        min(struct(col("rank"), col("dist"))).getField("dist").as("first"))
      .where(col("last") < col("first"))
    assert(bad.count() === 0)
  }

  test("nearest agrees with knnExact rank 1") {
    val k1 = Knn
      .knnExact(Tables.points(spark, sf0), Tables.queryPoints(spark, sf0), k = 1)
      .select(col("qid"), col("neighbor_id"), col("dist"))
    val n = Knn.nearest(Tables.points(spark, sf0), Tables.queryPoints(spark, sf0))
    assert(k1.except(n).count() === 0 && n.except(k1).count() === 0)
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
