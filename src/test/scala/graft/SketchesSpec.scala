package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val toks = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
    (1 to 100).map(i => s"uniq$i")

  test("count-min: estimates dominate true counts; exact when uncollided") {
    val df = toks.toDF("tok")
    val cms = Sketches.countMinSketch(df, d = 4, w = 256)
    val probes = Seq("alpha", "beta", "uniq1", "absent").toDF("tok")
    val est = Sketches.cmsEstimate(cms, probes, d = 4, w = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 50L && est("beta") >= 20L && est("uniq1") >= 1L)
    // with 170 tokens in 4x256 buckets, heavy hitters are near-exact
    assert(est("alpha") <= 60L && est("beta") <= 30L)
    assert(est("absent") <= 5L) // only collision mass
  }

  test("count-min counters are merge-order independent (pure sums)") {
    val whole = Sketches.countMinSketch(toks.toDF("tok"), d = 2, w = 32)
    val (a, b) = toks.splitAt(70)
    val merged = Sketches.countMinSketch(a.toDF("tok"), d = 2, w = 32)
      .unionByName(Sketches.countMinSketch(b.toDF("tok"), d = 2, w = 32))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("hll: estimate lands near the true distinct count; registers merge by max") {
    val df = toks.toDF("tok")
    val trueDistinct = toks.distinct.size // 102
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df))
      .head().getDouble(1)
    assert(est > trueDistinct * 0.7 && est < trueDistinct * 1.3,
      s"estimate $est vs true $trueDistinct")
    // split-merge by max == whole-corpus registers
    val (a, b) = toks.splitAt(70)
    val merged = Sketches.hllRegisters(a.toDF("tok"))
      .unionByName(Sketches.hllRegisters(b.toDF("tok")))
      .groupBy("register").agg(max("m").as("m"))
    assert(Sketches.hllRegisters(df).exceptAll(merged).isEmpty)
  }
}
