package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** The codegen'd native kernels must be BIT-IDENTICAL to the interpreted
  * HOF reference forms — the DuckDB oracles depend on it. */
class VectorExprSpec extends SparkSpec {

  lazy val pairs = {
    val p = Tables.points(spark, sf0)
    p.select(col("id").as("ia"), col("vec").as("a"))
      .join(p.select(col("id").as("ib"), col("vec").as("b")),
        col("ia") =!= col("ib") && col("ia") < 40 && col("ib") < 40)
  }

  test("native l2Sq is bit-identical to the HOF fold") {
    val d = pairs.select(
      l2Sq(col("a"), col("b")).as("native"),
      l2SqHof(col("a"), col("b")).as("hof"))
    assert(d.where(col("native") =!= col("hof")).count() === 0)
    assert(d.count() > 1000)
  }

  test("native dot is bit-identical to the HOF fold") {
    val d = pairs.select(
      dot(col("a"), col("b")).as("native"),
      dotHof(col("a"), col("b")).as("hof"))
    assert(d.where(col("native") =!= col("hof")).count() === 0)
  }

  test("native kernels work on double arrays too (centroids)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 5.0))).toDF("a", "b")
    val r = df.select(
      l2Sq(col("a"), col("b")), dot(col("a"), col("b")),
      l2Sq(col("a"), transform(col("b"), _.cast("float")))).head()
    assert(r.getDouble(0) === 13.0) // (1-3)^2 + (2-5)^2
    assert(r.getDouble(1) === 13.0) // 1*3 + 2*5
    assert(r.getDouble(2) === 13.0) // mixed double/float
  }
}
