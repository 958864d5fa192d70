package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Exact brute-force k-nearest-neighbor search.
  *
  * Reference semantics: the exact argmin scan in
  * /root/reference/src/algorithms/sharding/clustering/recall.py:34-46 and the
  * per-query top-k of utils.py:308-312, generalized to any k.
  *
  * Spark shape: queries are the SMALL side (10k in the reference,
  * kanndi_search.py:8) — broadcast them and stream the big points table
  * through a nested-loop join, then take per-query top-k with a window.
  * Spark >= 3.5 rewrites `row_number <= k` into WindowGroupLimit, which
  * applies a partial per-partition limit BEFORE the shuffle, so at cluster
  * scale only `numPartitions * numQueries * k` candidate rows move — the
  * 100 TB scan itself never shuffles.
  */
object Knn {

  /** Exact top-k: returns (qid, rank, neighbor_id, dist).
    *
    * Ranking is on the 4-dp-rounded distance with neighbor id as
    * deterministic tie-break, so results are reproducible across engines and
    * summation orders (FIXTURES.md oracle notes).
    */
  def knnExact(
      points: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      k: Int,
      distance: (Column, Column) => Column = l2Dist): DataFrame = {
    val joined = points
      .join(broadcast(queries))
      .withColumn("dist", round(distance(col("qvec"), col("vec")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    joined
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(
        col("qid"),
        col("rank"),
        col("id").as("neighbor_id"),
        col("dist"))
  }

  /** Exact cosine top-k with point/query norms computed ONCE instead of per
    * pair (2N norm folds instead of N*Q*2). Same values as
    * knnExact(distance = cosineDist).
    *
    * Cosine distance is RATIO-valued, so it rounds with [[roundHU]] (not
    * `round`) per the engine convention (VectorFunctions.roundHU doc):
    * plain round diverges cross-engine on exact .5 decimal boundaries. */
  def knnCosine(points: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val p = points.withColumn("pn", norm2(col("vec")))
    val q = queries.withColumn("qn", norm2(col("qvec")))
    val joined = p
      .join(broadcast(q))
      .withColumn("dist",
        roundHU(lit(1.0) - dot(col("qvec"), col("vec")) / (col("qn") * col("pn")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    joined
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("dist"))
  }

  /** Exact 1-NN as an aggregate (`min_by`) — cheaper than a window when only
    * the argmin is needed (recall.py:37-45 pattern). */
  def nearest(
      points: DataFrame,
      queries: DataFrame,
      distance: (Column, Column) => Column = l2Dist): DataFrame =
    points
      .join(broadcast(queries))
      .withColumn("dist", round(distance(col("qvec"), col("vec")), 4))
      .groupBy(col("qid"))
      .agg(
        min_by(col("id"), struct(col("dist"), col("id"))).as("neighbor_id"),
        min(struct(col("dist"), col("id"))).getField("dist").as("dist"))
}
