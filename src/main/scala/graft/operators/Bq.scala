package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** 1-bit binary quantization — the third standard vector-compression scheme
  * next to PQ ([[Pq]]) and SQ8 ([[Sq]]): each dimension collapses to a
  * single bit against its midpoint threshold, so a 64-dim float32 vector
  * becomes 64 bits (32× smaller) and candidate ranking is pure Hamming
  * distance over packed integer words — XOR + popcount, the cheapest
  * possible scan kernel. Production systems (FAISS's binary indexes,
  * Lucene/Elasticsearch BBQ — public literature) use exactly this shape:
  * Hamming over packed bits for the coarse cut, exact distances only for
  * the survivors.
  *
  * Scale shape: the threshold fit reuses [[Sq.fitRanges]]' one distributed
  * min/max aggregation (midpoint = (lo+hi)/2 — exact doubles, no
  * sum-order dependence); encode is a map-only fold (no UDF, no explode);
  * search is the [[Knn.knnExact]] broadcast plan over a 32×-lighter scan
  * plus an equi-join refine that touches raw vectors ONLY for the
  * k·refine candidates per query. At 100 TB the full-precision table is
  * read by the refine join alone — the scan that has to be fast holds 8
  * bytes per vector.
  *
  * Bits pack into 32-bit BIGINT words (not 64): every intermediate of the
  * acc·2+bit fold then stays far from signed-64 overflow, which DuckDB
  * raises as an error rather than wrapping, so the oracle (q128) replays
  * the packing with plain integer shifts.
  */
object Bq {

  val wordBits = 32

  /** Per-dimension midpoint thresholds from the exact (lo, hi) ranges. */
  def fitThresholds(ranges: Array[(Double, Double)]): Array[Double] =
    ranges.map { case (lo, hi) => (lo + hi) / 2.0 }

  /** Map-only 1-bit encode: bit j (1-based within its word) of word w is
    * set iff v_{w·32+j} > mid_{w·32+j}; the reverse-fold acc·2+bit makes
    * word w = Σ_j bit_j·2^(j-1). Output: (idCol, w0, w1, …). */
  def encode(points: DataFrame, mids: Array[Double],
      idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val midArr = array(mids.map(lit(_)): _*)
    val nWords = (mids.length + wordBits - 1) / wordBits
    val bits = zip_with(col(vecCol), sequence(lit(1), lit(mids.length)),
      (v, i) => when(v.cast("double") > element_at(midArr, i), lit(1L))
        .otherwise(lit(0L)))
    val words = (0 until nWords).map { w =>
      aggregate(reverse(slice(bits, w * wordBits + 1, wordBits)),
        lit(0L), (acc, b) => acc * 2 + b).as(s"w$w")
    }
    points.select((col(idCol) +: words): _*)
  }

  /** Hamming-ranked candidate cut + exact refine: rank the packed codes by
    * Σ_w popcount(w XOR qw) (tie-break id), keep k·refine per query, then
    * join raw vectors for the survivors only and re-rank by exact L2.
    * Returns (qid, rank, neighbor_id, dist, hamming). */
  def search(codes: DataFrame, points: DataFrame, queries: DataFrame,
      mids: Array[Double], k: Int, refine: Int): DataFrame = {
    val nWords = (mids.length + wordBits - 1) / wordBits
    val qcodes = (0 until nWords).foldLeft(
      encode(queries, mids, idCol = "qid", vecCol = "qvec")) {
      (df, w) => df.withColumnRenamed(s"w$w", s"qw$w")
    }
    val ham = (0 until nWords)
      .map(w => bit_count(col(s"w$w").bitwiseXOR(col(s"qw$w"))))
      .reduce(_ + _)
    val cw = Window.partitionBy(col("qid")).orderBy(col("hamming"), col("id"))
    val cand = codes.join(broadcast(qcodes))
      .withColumn("hamming", ham.cast("long"))
      .withColumn("crank", row_number().over(cw))
      .where(col("crank") <= k * refine)
      .select(col("qid"), col("id"), col("hamming"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    cand.join(points, "id")
      .join(broadcast(queries), "qid")
      .withColumn("dist", round(l2Dist(col("qvec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
        col("dist"), col("hamming"))
  }
}
