package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the second standard vector-compression scheme
  * next to product quantization ([[Pq]]): each dimension is linearly mapped
  * to a uint8 code against its (lo, hi) range; approximate search
  * dequantizes to bucket centers and runs the exact kernel asymmetrically
  * (raw query vs dequantized points). 8× smaller than float32 with far
  * better recall than PQ at the same scan cost — the usual first step of a
  * compressed index (FAISS's SQ8, Lucene's scalar quantizer are the same
  * construction, from the public literature).
  *
  * Scale shape: the range fit is ONE distributed min/max aggregation
  * (2·dim doubles — a driver artifact like the centroid sets); encode and
  * dequantize are map-only `transform` projections over literal ranges, so
  * the search plan is identical to brute-force kNN ([[Knn.knnExact]]) over
  * an 8× lighter scan.
  *
  * All arithmetic is elementary double ops in array order, so the DuckDB
  * oracle replays it exactly (q51).
  */
object Sq {

  /** Per-dimension (lo, hi) ranges, ordered by dim. */
  def fitRanges(points: DataFrame): Array[(Double, Double)] =
    Stats.longForm(points)
      .groupBy(col("dim"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .orderBy(col("dim"))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))

  private def loCol(ranges: Array[(Double, Double)]): Column =
    array(ranges.map(r => lit(r._1)): _*)
  private def hiCol(ranges: Array[(Double, Double)]): Column =
    array(ranges.map(r => lit(r._2)): _*)

  /** Map-only SQ8 encode: code_d = floor((v_d - lo_d)/(hi_d - lo_d)·255)
    * (0 when the dimension is constant). Codes as int array (uint8 range). */
  def encode(points: DataFrame, ranges: Array[(Double, Double)]): DataFrame = {
    val lo = loCol(ranges)
    val hi = hiCol(ranges)
    points.select(col("id"),
      zip_with(col("vec"), sequence(lit(1), lit(ranges.length)), (v, i) => {
        val l = element_at(lo, i)
        val h = element_at(hi, i)
        when(h === l, lit(0))
          .otherwise(floor((v.cast("double") - l) / (h - l) * 255).cast("int"))
      }).as("codes"))
  }

  /** Dequantize codes to bucket centers: lo + (c + 0.5)·(hi - lo)/256. */
  def dequantize(codes: DataFrame, ranges: Array[(Double, Double)]): DataFrame = {
    val lo = loCol(ranges)
    val hi = hiCol(ranges)
    codes.select(col("id"),
      zip_with(col("codes"), sequence(lit(1), lit(ranges.length)), (c, i) => {
        val l = element_at(lo, i)
        val h = element_at(hi, i)
        l + (c.cast("double") + lit(0.5)) * (h - l) / lit(256.0)
      }).as("vec"))
  }

  /** Asymmetric SQ search: exact top-k kernel over the dequantized codes —
    * the plan is [[Knn.knnExact]] on an 8×-compressed scan. */
  def searchAsym(
      codes: DataFrame,
      ranges: Array[(Double, Double)],
      queries: DataFrame,
      k: Int): DataFrame =
    Knn.knnExact(dequantize(codes, ranges), queries, k)
}
