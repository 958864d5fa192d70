package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * `(SparkSession, sfDir) => DataFrame` query; `oracleSql` carries the
  * equivalent DuckDB SQL over the same parquet tables. Column names are
  * aligned between both sides (the driver sorts columns by name before
  * hashing). All float outputs are rounded (4-6 dp) on BOTH sides so
  * summation-order differences can't flip the hash (FIXTURES.md).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Knn.knnExact(Tables.points(spark, dir), Tables.queryPoints(spark, dir), k = 10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational sanity: TPC-H-ish pricing summary (agg + filter pushdown)
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // ---- M1: exact brute-force kNN (SURVEY §2 J3/W1)
    "q02_knn_exact" -> ((s, dir) =>
      Knn.knnExact(Tables.points(s, dir), Tables.queryPoints(s, dir), k = 10)),

    // ---- M1: exact 1-NN via min_by aggregate (SURVEY §2 W3)
    "q03_nearest" -> ((s, dir) =>
      Knn.nearest(Tables.points(s, dir), Tables.queryPoints(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_knn_exact" -> Oracles.knnExact(k = 10, stride = 25),

    "q03_nearest" ->
      s"""WITH pairs AS (
         |  SELECT qs.qid, pts.id, ${Oracles.l2("qs.qvec", "pts.vec")} AS dist
         |  FROM (${Oracles.queryPoints(25)}) qs CROSS JOIN (${Oracles.points}) pts
         |),
         |ranked AS (
         |  SELECT qid, id, dist,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rn
         |  FROM pairs
         |)
         |SELECT qid, id AS neighbor_id, dist FROM ranked WHERE rn = 1""".stripMargin
  )
}

/** Shared DuckDB SQL fragments for the oracle side. Kept adjacent to the
  * Spark implementations so the two stay in lock-step (same rounding, same
  * tie-breaks, same column names). */
object Oracles {
  val dim = 64

  /** Exact double-precision L2 distance between two LIST(FLOAT) columns,
    * rounded to 4 dp — mirrors VectorFunctions.l2Dist + round. */
  def l2(a: String, b: String): String =
    s"round(sqrt(list_sum(list_transform(generate_series(1, $dim), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))), 4)"

  def points: String = "SELECT vec_id AS id, embedding AS vec FROM embeddings"

  def queryPoints(stride: Int): String =
    s"SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % $stride = 0"

  def knnExact(k: Int, stride: Int): String =
    s"""WITH pairs AS (
       |  SELECT qs.qid, pts.id AS neighbor_id, ${l2("qs.qvec", "pts.vec")} AS dist
       |  FROM (${queryPoints(stride)}) qs CROSS JOIN ($points) pts
       |),
       |ranked AS (
       |  SELECT qid, neighbor_id, dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS "rank"
       |  FROM pairs
       |)
       |SELECT qid, "rank", neighbor_id, dist FROM ranked WHERE "rank" <= $k""".stripMargin
}
