package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join on skewed data") {
    // events.user_id is a natural key; join against a small dim of users
    val ev = Tables.events(spark, sf0)
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("segment", (col("user_id") % 3).cast("int"))
    val plain = ev.join(dim, "user_id")
      .groupBy("segment").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(ev, dim, "user_id", "event_id", 8)
      .groupBy("segment").agg(count(lit(1)).as("n"))
    assert(salted.except(plain).count() === 0 && plain.except(salted).count() === 0)
  }

  test("saltedCountSum equals the direct aggregation") {
    val ev = Tables.events(spark, sf0)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val salted = Skew.saltedCountSum(ev, "event_type", "event_id", "value", 8)
    assert(salted.except(direct).count() === 0 && direct.except(salted).count() === 0)
  }
}
