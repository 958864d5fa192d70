package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bq, Knn}

class BqSpec extends SparkSpec {
  import spark.implicits._

  test("encode: hand-computed bit packing into 32-bit words") {
    // 34 dims, thresholds all 0.5: bits = dims with value 1.0
    val mids = Array.fill(34)(0.5)
    val vec = Array.tabulate(34)(i => if (Set(0, 1, 5, 31, 32, 33)(i)) 1.0f else 0.0f)
    val got = Bq.encode(Seq((7L, vec)).toDF("id", "vec"), mids).head()
    // word 0: bits (1-based j) 1,2,6,32 -> 1 + 2 + 32 + 2^31
    assert(got.getLong(1) === (1L + 2L + 32L + (1L << 31)))
    // word 1: dims 33,34 -> j=1,2 -> 1 + 2
    assert(got.getLong(2) === 3L)
  }

  test("encode: strict inequality at the threshold") {
    val mids = Array(1.0, -2.0)
    val df = Seq((0L, Array(1.0f, -2.0f)), (1L, Array(1.5f, -1.0f))).toDF("id", "vec")
    val rows = Bq.encode(df, mids).orderBy($"id").collect()
    assert(rows(0).getLong(1) === 0L) // v == mid: bit clear
    assert(rows(1).getLong(1) === 3L)
  }

  test("search: refine recovers exact top-k when the cut is wide enough") {
    val rnd = new scala.util.Random(42)
    val pts = (0L until 200L).map(i => (i, Array.fill(64)(rnd.nextFloat()))).toDF("id", "vec")
    val qs = (0L until 5L).map(i => (i * 37L, Array.fill(64)(rnd.nextFloat()))).toDF("qid", "qvec")
    val mids = Bq.fitThresholds(graft.operators.Sq.fitRanges(pts))
    // refine = |points|/k: every point survives the cut -> exact
    val got = Bq.search(Bq.encode(pts, mids), pts, qs, mids, k = 3, refine = 67)
      .select($"qid", $"rank", $"neighbor_id", $"dist").collect().toSet
    val want = Knn.knnExact(pts, qs, k = 3).collect().toSet
    assert(got === want)
  }

  test("search: hamming cut keeps only k*refine candidates per query") {
    val rnd = new scala.util.Random(7)
    val pts = (0L until 100L).map(i => (i, Array.fill(64)(rnd.nextFloat()))).toDF("id", "vec")
    val qs = Seq((0L, Array.fill(64)(rnd.nextFloat()))).toDF("qid", "qvec")
    val mids = Bq.fitThresholds(graft.operators.Sq.fitRanges(pts))
    val got = Bq.search(Bq.encode(pts, mids), pts, qs, mids, k = 2, refine = 3)
    // every returned neighbor must be among the 6 best-hamming candidates
    assert(got.count() === 2L)
    val hams = got.select($"hamming").as[Long].collect()
    val allHam = Bq.search(Bq.encode(pts, mids), pts, qs, mids, k = 100, refine = 1)
      .select($"hamming").as[Long].collect().sorted
    assert(hams.forall(_ <= allHam(5)))
  }
}
