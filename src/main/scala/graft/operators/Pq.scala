package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization — the compression the reference's "BuddyPQ" work
  * aims at (/root/reference/README.md:5-7: dimension permutation to improve
  * PQ recall; the PQ engine itself never shipped in the repo). The
  * `buddy_up` permutation (Stats.buddyUpLong) composes directly in front of
  * `fit`/`encode` to reproduce the BuddyPQ idea end-to-end.
  *
  * Vectors are split into `m` subvectors of `dsub` dims; each subspace gets
  * a k-codeword codebook (deterministic Lloyd's, same oracle-replayable fit
  * as Sharding.fitCentroids). A point is stored as m small codes; search
  * uses the asymmetric distance computation (ADC): per query, an m×k lookup
  * table of exact subspace distances, then candidate distance = sum of m
  * table entries.
  *
  * Scale shape: codebooks are m*k*dsub doubles — always broadcast. Encoding
  * is a map-only broadcast argmin. ADC joins the (compact) codes table with
  * the broadcast LUT — the 100 TB of raw vectors is touched only at encode
  * time; search reads m bytes per point.
  */
object Pq {

  /** Slice subvector `sub` (0-based) of width dsub. */
  private def subvec(vec: org.apache.spark.sql.Column, sub: Int, dsub: Int) =
    slice(vec, sub * dsub + 1, dsub)

  /** Fit per-subspace codebooks: (sub, code, centroid: Array[Double]). */
  def fit(
      spark: SparkSession,
      points: DataFrame,
      m: Int,
      dsub: Int,
      k: Int,
      iters: Int): DataFrame =
    (0 until m)
      .map { s =>
        val sliced = points.select(col("id"), subvec(col("vec"), s, dsub).as("vec"))
        Sharding.fitCentroids(spark, sliced, k, iters)
          .select(lit(s).as("sub"), col("shard_id").as("code"), col("centroid"))
      }
      .reduce(_.unionByName(_))

  /** Encode every point: (id, sub, code) — per subspace argmin codeword
    * under the engine ranking convention (rounded dist, code tie-break). */
  def encode(points: DataFrame, codebooks: DataFrame, m: Int, dsub: Int): DataFrame = {
    val subs = points.select(col("id"),
      explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), subvec(col("vec"), s, dsub).as("sv"))): _*)).as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    subs
      .join(broadcast(codebooks), "sub")
      .select(col("id"), col("sub"),
        round(l2Dist(col("sv"), col("centroid")), 4).as("d"), col("code"))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("d"), col("code"))).as("best"))
      .select(col("id"), col("sub"), col("best.code").as("code"))
  }

  /** IVF-PQ: ADC restricted to a routed candidate set (qid, id) — the
    * composition of centroid routing (ShardedSearch.route x Sharding.assign)
    * with PQ codes. Candidates and LUT are small relative to the corpus;
    * the codes table is the only big input and it is filtered by the
    * candidate join before any distance math. */
  def adcSearchRouted(
      queries: DataFrame, // (qid, qvec)
      candidates: DataFrame, // (qid, id)
      codes: DataFrame,
      codebooks: DataFrame,
      m: Int,
      dsub: Int,
      k: Int): DataFrame = {
    val qsubs = queries.select(col("qid"),
      explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), subvec(col("qvec"), s, dsub).as("qsv"))): _*)).as("e"))
      .select(col("qid"), col("e.sub").as("sub"), col("e.qsv").as("qsv"))
    val lut = qsubs
      .join(broadcast(codebooks), "sub")
      .select(col("qid"), col("sub"), col("code"),
        l2Sq(col("qsv"), col("centroid")).as("pd"))
    val dists = candidates
      .join(codes, "id")
      .join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(round(sqrt(sum(col("pd"))), 4).as("approx_dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("approx_dist"), col("id"))
    dists
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("approx_dist"))
  }

  /** ADC search with EXACT RE-RANK (the "refine" stage every production PQ
    * engine ships): ADC proposes top-(k·refine) candidates from the compact
    * codes, then the raw vectors of ONLY those candidates are fetched for
    * exact distances and the top-k re-ranked. At 100 TB the raw-vector
    * access is a broadcast-semi-join-shaped point lookup of |Q|·k·refine
    * ids against the (sorted/bucketed) points table — never a scan of the
    * full corpus with per-pair math. Returns exact (qid, rank, neighbor_id,
    * dist). */
  def adcRefine(
      queries: DataFrame, // (qid, qvec)
      codes: DataFrame,
      codebooks: DataFrame,
      points: DataFrame, // (id, vec) raw vectors for the refine fetch
      m: Int,
      dsub: Int,
      k: Int,
      refine: Int = 4): DataFrame = {
    val approx = adcSearch(queries, codes, codebooks, m, dsub, k * refine)
    val cand = approx.select(col("qid"), col("neighbor_id").as("id"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    points
      .join(broadcast(cand), "id")
      .join(broadcast(queries), "qid")
      .withColumn("dist", round(l2Dist(col("qvec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("dist"))
  }

  /** ADC top-k search over encoded points: (qid, rank, neighbor_id,
    * approx_dist). `codes` is the long-form encode output. */
  def adcSearch(
      queries: DataFrame,
      codes: DataFrame,
      codebooks: DataFrame,
      m: Int,
      dsub: Int,
      k: Int): DataFrame = {
    val qsubs = queries.select(col("qid"),
      explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), subvec(col("qvec"), s, dsub).as("qsv"))): _*)).as("e"))
      .select(col("qid"), col("e.sub").as("sub"), col("e.qsv").as("qsv"))
    // LUT: exact subspace distance from each query to each codeword
    val lut = qsubs
      .join(broadcast(codebooks), "sub")
      .select(col("qid"), col("sub"), col("code"),
        l2Sq(col("qsv"), col("centroid")).as("pd"))
    val dists = codes
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(round(sqrt(sum(col("pd"))), 4).as("approx_dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("approx_dist"), col("id"))
    dists
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("approx_dist"))
  }
}
