package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  // 2-dim fixture with known stats: dim0 = [0,1,2,3], dim1 = [0,2,4,6]
  lazy val tiny = Seq(
    (0L, Array(0f, 0f)), (1L, Array(1f, 2f)),
    (2L, Array(2f, 4f)), (3L, Array(3f, 6f))
  ).toDF("id", "vec")

  test("varianceEntropy: var_pop and uniform-bin entropy") {
    val r = Stats.varianceEntropy(tiny).orderBy("dim").collect()
    assert(r(0).getDouble(1) === 1.25) // var_pop([0,1,2,3])
    assert(r(1).getDouble(1) === 5.0) // var_pop([0,2,4,6])
    // all values distinct at 2dp -> entropy = ln(4)
    assert(math.abs(r(0).getDouble(2) - math.log(4)) < 1e-6)
  }

  test("ksAllPairs on identical distributions is 0, disjoint is 1") {
    val same = Seq((0L, Array(1f, 1f)), (1L, Array(2f, 2f))).toDF("id", "vec")
    assert(Stats.ksAllPairs(same).head().getDouble(2) === 0.0)
    val disj = Seq((0L, Array(1f, 10f)), (1L, Array(2f, 20f))).toDF("id", "vec")
    assert(Stats.ksAllPairs(disj).head().getDouble(2) === 1.0)
  }

  test("corrPairs: perfectly linear dims have corr 1") {
    assert(Stats.corrPairs(tiny).head().getDouble(2) === 1.0)
  }

  test("vifMatrix inverts a known 2x2 correlation matrix") {
    // corr = [[1, 0.5], [0.5, 1]] -> inverse = [[4/3, -2/3], [-2/3, 4/3]]
    // build data with corr 0.5: x=[1,2,3,4,...], y constructed
    // easier: verify inv on tiny's perfect corr is singular-adjacent — use
    // a fixture with corr 0.5 instead.
    val xs = Seq(0.0, 1.0, 2.0, 3.0)
    val ys = Seq(0.0, 3.0, 1.0, 4.0) // corr(x,y) = 0.6
    val df = xs.zip(ys).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, Array(x.toFloat, y.toFloat)) }
      .toDF("id", "vec")
    val vif = Stats.vifMatrix(spark, df).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val c = 5.0 / math.sqrt(50.0) // corr of the fixture = 1/sqrt(2)
    val det = 1 - c * c
    assert(math.abs(vif((0, 0)) - 1 / det) < 1e-4)
    assert(math.abs(vif((0, 1)) - (-c / det)) < 1e-4)
  }

  test("buddyOrder walks edges by descending weight") {
    val edges = Seq((3, 5, 0.9), (1, 2, 0.8), (0, 1, 0.7))
      .toDF("src", "dst", "weight")
    val order = Stats.buddyOrder(spark, edges, nDims = 6)
      .orderBy("order_idx").collect().map(_.getInt(1)).toSeq
    assert(order === Seq(3, 5, 1, 2, 0, 4))
  }

  test("blend = vif + (1 - ks)") {
    val vif = Seq((0, 1, 2.0)).toDF("dim_i", "dim_j", "vif")
    val ks = Seq((0, 1, 0.25)).toDF("dim_i", "dim_j", "ks")
    assert(Stats.blend(vif, ks).head().getDouble(2) === 2.75)
  }

  test("buddyUpLong applies the permutation") {
    val r = Stats.buddyUpLong(tiny, Seq(1, 0))
      .where(col("id") === 1L).orderBy("dim").collect()
    assert(r.map(_.getDouble(2)).toSeq === Seq(2.0, 1.0))
  }

  test("covMatrix: symmetric, diagonal equals var_pop") {
    val c = Stats.covMatrix(tiny).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(c((0, 0)) === 1.25) // var_pop([0,1,2,3])
    assert(c((1, 1)) === 5.0) // var_pop([0,2,4,6])
    assert(c((0, 1)) === c((1, 0)))
    assert(c((0, 1)) === 2.5) // E[xy] - mu_x*mu_y = 7 - 1.5*3
  }

  test("powerIteration: Fibonacci iterates of [[2,1],[1,1]], unit-normalized") {
    val cov = Seq((0, 0, 2.0), (0, 1, 1.0), (1, 0, 1.0), (1, 1, 1.0))
      .toDF("i", "j", "c")
    // v0=[1,1] -> [3,2] -> [8,5] -> [21,13]; ss=610
    val r = Stats.powerIteration(cov, rounds = 3).orderBy("dim").collect()
    assert(math.abs(r(0).getDouble(1) - 21.0 / math.sqrt(610)) < 1e-6)
    assert(math.abs(r(1).getDouble(1) - 13.0 / math.sqrt(610)) < 1e-6)
    // and it is converging on the dominant eigenvector [1, (sqrt(5)-1)/2]
    val golden = (math.sqrt(5) - 1) / 2
    assert(math.abs(r(1).getDouble(1) / r(0).getDouble(1) - golden) < 0.01)
  }
}
