package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions._

/** Dataset sharding by K-Means clustering — the reference's
  * `centroids.py` (fit) + `shard.py` (assign + bucket sinks) pipeline
  * (/root/reference/src/algorithms/sharding/clustering/), rebuilt as
  * DataFrame ops:
  *
  *  - fit: deterministic Lloyd's iterations expressed as Spark jobs with the
  *    (tiny) centroid set collected to the driver each round — the same
  *    shape spark.ml's KMeans uses internally, but with a fully
  *    deterministic init (first-k points) and tie-break so the DuckDB
  *    oracle can replay it as unrolled SQL CTEs.
  *  - assign: broadcast nearest-centroid join (J4) via min(struct(dist,id))
  *    — deterministic argmin, no window shuffle.
  *  - sinks: `writeSharded` persists the points partitioned by shard_id —
  *    the engine's replacement for per-shard HNSW files (SURVEY §2 S7/S8):
  *    at scale the partition layout + broadcast centroid router IS the index.
  */
object Sharding {

  /** Median pairwise L2 distance over the first `sampleSize` points —
    * `compute_median_dist` (kanndi/shard_by_distance.py:39-78): pdist over
    * the unordered pairs {i<j}, exact median. Returns one row
    * (n_pairs, median_dist). */
  def medianPairwiseDist(points: DataFrame, sampleSize: Int): DataFrame = {
    val s = points.where(col("id") < sampleSize)
    val a = s.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val b = s.select(col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(round(l2Dist(col("vec_a"), col("vec_b")), 4).as("dist"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(expr("percentile(dist, 0.5)"), 4).as("median_dist"))
  }

  /** First-k-by-id init (deterministic; reference seeds MiniBatchKMeans with
    * RANDOM_SEED=505 — we trade its RNG for a replayable init). */
  def initCentroids(points: DataFrame, k: Int): DataFrame =
    points
      .where(col("id") < k)
      .select(col("id").cast("int").as("shard_id"), vecD(col("vec")).as("centroid"))

  /** Nearest-centroid assignment (J4): (id, shard_id, dist).
    * `centroids` must be small — it is always broadcast.
    *
    * Ranking convention (engine-wide, FIXTURES.md): argmin over the
    * 4-dp-ROUNDED distance with shard_id as tie-break, so the result is
    * reproducible across engines/summation orders. */
  def assign(points: DataFrame, centroids: DataFrame): DataFrame =
    points
      .join(broadcast(centroids))
      .select(
        col("id"),
        col("shard_id"),
        round(l2Dist(col("vec"), col("centroid")), 4).as("dist"))
      .groupBy(col("id"))
      .agg(
        min(struct(col("dist"), col("shard_id"))).as("m"))
      .select(
        col("id"),
        col("m.shard_id").as("shard_id"),
        col("m.dist").as("dist"))

  /** Map-only nearest-centroid assignment against a driver-held centroid
    * set — the literal twin of [[assign]] with the identical ranking
    * convention (4-dp-rounded dist, shard_id tie-break). The centroids ride
    * the plan as literals and the argmin is an array_min over k candidate
    * structs, so assignment is a pure projection over the scan: NO shuffle,
    * where the relational form pays a groupBy(id) reduction. At 100 TB this
    * is the difference between "assignment = one pass over the data" and
    * "assignment = reshuffling the corpus". ShardingSpec asserts
    * row-identity with [[assign]]. */
  def assignLit(
      points: DataFrame,
      cents: Array[(Int, Array[Double])],
      keepVec: Boolean = false): DataFrame = {
    // Two physical forms, identical semantics (ShardingSpec row-identity):
    // small k unrolls one candidate struct per centroid (the plan the
    // verified sf contract audits); large k switches to the loop-codegen
    // NearestCentroid kernel — the unrolled projection overflows janino's
    // 64 KB method limit around k≈80 and falls back to interpreted mode,
    // exactly when k is scaling with the corpus (see ScaleBench).
    val m =
      if (cents.length <= 16) {
        array_min(array(cents.map { case (sid, c) =>
          struct(
            round(l2Dist(col("vec"), typedLit(c.toSeq)), 4).as("dist"),
            lit(sid).as("shard_id"))
        }: _*))
      } else {
        val dim = cents.head._2.length
        graft.functions.VectorExpressions.nearestCentroid(
          col("vec"), cents.map(_._1), cents.flatMap(_._2), dim)
      }
    val cols = Seq(col("id"), col("m.shard_id").as("shard_id"), col("m.dist").as("dist")) ++
      (if (keepVec) Seq(col("vec")) else Nil)
    points.withColumn("m", m).select(cols: _*)
  }

  /** Recompute centroids as the per-shard elementwise mean (Lloyd's M-step):
    * explode to (shard_id, dim, value), average, reassemble. */
  private def meanCentroids(points: DataFrame, assigned: DataFrame): DataFrame =
    assigned
      .join(points, "id")
      .select(col("shard_id"), posexplode(col("vec")).as(Seq("dim", "v")))
      .groupBy(col("shard_id"), col("dim"))
      .agg(avg(col("v").cast("double")).as("mv"))
      .groupBy(col("shard_id"))
      .agg(sort_array(collect_list(struct(col("dim"), col("mv")))).as("pairs"))
      .select(
        col("shard_id"),
        transform(col("pairs"), p => p.getField("mv")).as("centroid"))

  /** Deterministic Lloyd's K-Means: `iters` full assign+mean rounds from the
    * first-k init. Centroids are collected to the driver between rounds
    * (k*dim doubles — tiny), keeping lineage flat; each round is one
    * distributed job, the same structure as `MiniBatchKMeans.partial_fit`
    * over the whole data (centroids.py:93-104). Returns (shard_id, centroid). */
  def fitCentroids(
      spark: SparkSession,
      points: DataFrame,
      k: Int,
      iters: Int): DataFrame = {
    var cents = initCentroids(points, k)
    for (_ <- 1 to iters) {
      val assigned = assign(points, cents)
      // collect + rebuild: bounded driver state, flat lineage per round
      val rows = meanCentroids(points, assigned).collect().toSeq
      val schema = StructType(Seq(
        StructField("shard_id", IntegerType, false),
        StructField("centroid", ArrayType(DoubleType, false), false)))
      cents = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          Row(r.getInt(0), r.getSeq[Double](r.fieldIndex("centroid")))), 1),
        schema)
    }
    cents
  }

  /** spark.ml K-Means alternative fit (the built-in path SURVEY §2 A15
    * recommends; seed matches the reference's RANDOM_SEED=505,
    * config_bigann_small.py). Deterministic given the seed but not
    * SQL-replayable — use [[fitCentroids]] when an oracle must replay the
    * fit; use this when quality/speed at scale matters. */
  def fitCentroidsML(
      spark: SparkSession,
      points: DataFrame,
      k: Int,
      maxIter: Int = 20,
      seed: Long = 505L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = points.select(col("id"), array_to_vector(vecD(col("vec"))).as("features"))
    val model = new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed).fit(feats)
    val rows = model.clusterCenters.zipWithIndex.map { case (c, i) => Row(i, c.toArray.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField("shard_id", IntegerType, false),
        StructField("centroid", ArrayType(DoubleType, false), false))))
  }

  /** Min/median/max of pairwise centroid cosine similarity — the
    * reference's `show_distance_stats` spread report (shard.py:48-55,
    * centroids.py:38-50). */
  def centroidSpreadStats(centroids: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.cosineSim
    val a = centroids.select(col("shard_id").as("sa"), col("centroid").as("ca"))
    val b = centroids.select(col("shard_id").as("sb"), col("centroid").as("cb"))
    a.join(broadcast(b), col("sa") < col("sb"))
      // cosine is ratio-valued: roundHU, not round (engine convention)
      .select(roundHU(cosineSim(col("ca"), col("cb")), 6).as("cos"))
      .agg(
        count(lit(1)).as("n_pairs"),
        roundHU(min(col("cos")), 6).as("min_cos"),
        roundHU(expr("percentile(cos, 0.5)"), 6).as("median_cos"),
        roundHU(max(col("cos")), 6).as("max_cos"))
  }

  /** Log-scale histogram of shard sizes — `distributions.py:1-8` (A14/S12):
    * bucket = floor(ln(n) / binWidth). */
  def shardSizeHistogram(sizes: DataFrame, binWidth: Double = 0.5): DataFrame =
    sizes
      .groupBy(floor(log(col("n")) / binWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_shards"))

  /** Long-form view of a centroid set for oracle-friendly output. */
  def centroidsLong(centroids: DataFrame): DataFrame =
    centroids
      .select(col("shard_id"), posexplode(col("centroid")).as(Seq("dim", "v")))
      .select(col("shard_id"), col("dim"), round(col("v"), 6).as("value"))

  /** Shard-size distribution + saturation percent — the bucket CSV sink +
    * saturation logic (shard.py:139-147; shard_by_distance.py:98-99,271). */
  def shardSizes(assigned: DataFrame, expectedShardSize: Long): DataFrame =
    assigned
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("shard_id"),
        col("n"),
        round(col("n") * 100.0 / expectedShardSize, 2).as("saturation_pct"))

  /** Bucketed-by-id layout: co-locates rows by hash(id) so REPEATED
    * id-equi-joins against the corpus — refine fetches (Pq.adcRefine),
    * recall joins, ground-truth joins, incremental upserts — are
    * EXCHANGE-FREE: both sides read pre-bucketed files and sort-merge join
    * without any shuffle (asserted in ShardingSpec). The complement of
    * [[writeSharded]]: partitionBy(shard_id) prunes the SEARCH path,
    * bucketBy(id) de-shuffles the LOOKUP path; a production index uses
    * both (partition columns and bucket spec compose in one write). */
  def writeBucketedById(points: DataFrame, table: String, buckets: Int): Unit =
    points.write
      .mode("overwrite")
      .bucketBy(buckets, "id")
      .sortBy("id")
      .format("parquet")
      .saveAsTable(table)

  /** Persist points partitioned by shard — the engine's "index build" sink.
    * Sorting within partitions by id keeps parquet row-groups clusterable;
    * at 100 TB each shard_id directory is independently scannable and the
    * search path prunes all but the routed shards. */
  def writeSharded(points: DataFrame, assigned: DataFrame, path: String): Unit =
    points
      .join(assigned.select("id", "shard_id"), "id")
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("id"))
      .write
      .mode("overwrite")
      .partitionBy("shard_id")
      .parquet(path)
}
