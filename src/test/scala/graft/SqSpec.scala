package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, ShardedSearch, Sq}

class SqSpec extends SparkSpec {

  lazy val pts = Tables.points(spark, sf0).cache()
  lazy val ranges = Sq.fitRanges(pts)

  test("ranges cover every dimension; codes stay in uint8 range") {
    assert(ranges.length === 64)
    assert(ranges.forall { case (lo, hi) => lo <= hi })
    val codes = Sq.encode(pts, ranges)
    val mm = codes.select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= 255)
  }

  test("dequantization error is bounded by the bucket width") {
    val dq = Sq.dequantize(Sq.encode(pts, ranges), ranges)
    val maxSpan = ranges.map { case (lo, hi) => hi - lo }.max
    val err = dq.withColumnRenamed("vec", "dv")
      .join(pts, "id")
      .select(posexplode(arrays_zip(col("dv"), col("vec"))).as(Seq("i", "z")))
      .select(abs(col("z.dv") - col("z.vec").cast("double")).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(err <= maxSpan / 100.0, s"max dequant error $err")
  }

  test("asymmetric SQ search recall is near-exact (far above PQ)") {
    val qs = Tables.queryPoints(spark, sf0)
    val exact = Knn.knnExact(pts, qs, 10)
    val sq = Sq.searchAsym(Sq.encode(pts, ranges), ranges, qs, 10)
    val rec = ShardedSearch.recallAtK(exact, sq, 10).head().getDouble(1)
    assert(rec > 0.9, s"SQ8 recall $rec") // 8-bit per dim barely perturbs ranks
  }
}
