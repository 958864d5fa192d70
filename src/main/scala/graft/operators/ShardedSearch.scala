package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Shard-routed top-k search — the reference's query path
  * (kanndi_search.py:28-66, search_by_cluster.py:57-86): route each query to
  * its top-T nearest centroids, search only those shards, union and re-rank.
  * The reference searches only the top-1 shard; its README specifies the
  * multi-shard union + re-sort (kanndi/README.md SEARCHING 2-5) which we
  * implement with T as the probe-count knob.
  *
  * Scale shape: centroids and routes are tiny (broadcast); the points side
  * arrives pre-assigned (and, when persisted via Sharding.writeSharded,
  * partition-pruned to the routed shards). The candidate set is
  * |queries| * T * shardSize instead of |queries| * N — the whole point of
  * sharding. The final top-k window benefits from WindowGroupLimit's
  * partial per-partition limit before the shuffle.
  */
object ShardedSearch {

  /** Per-query top-T nearest centroids (J5/W2): (qid, shard_id, centroid_rank). */
  def route(queries: DataFrame, centroids: DataFrame, t: Int): DataFrame = {
    val d = l2Dist(col("qvec"), col("centroid"))
    val w = Window.partitionBy(col("qid")).orderBy(round(d, 4), col("shard_id"))
    queries
      .join(broadcast(centroids))
      .withColumn("centroid_rank", row_number().over(w))
      .where(col("centroid_rank") <= t)
      .select(col("qid"), col("qvec"), col("shard_id"), col("centroid_rank"))
  }

  /** Routed search: (qid, rank, neighbor_id, dist, shard_id).
    *
    * @param shardedPoints (id, vec, shard_id) — e.g. points joined with a
    *   Sharding.assign result, or a read of a partitionBy(shard_id) layout.
    */
  def search(
      shardedPoints: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int,
      t: Int,
      distance: (Column, Column) => Column = l2Dist): DataFrame = {
    val routes = route(queries, centroids, t)
    // equi-join on shard_id: only routed shards' points become candidates
    val cands = shardedPoints
      .join(broadcast(routes), "shard_id")
      .withColumn("dist", round(distance(col("qvec"), col("vec")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    cands
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("dist"), col("shard_id"))
  }

  /** Routed search with the typed heap aggregator as the top-k operator —
    * row-identical to [[search]] (asserted in ShardingSpec). The heap
    * combines map-side, so the shuffle carries |queries|·k·numPartitions
    * rows with NO candidate sort (the window form pays a per-partition sort
    * under WindowGroupLimit) — the better 100 TB shape when candidate sets
    * per partition are huge. At small SF the window form's codegen'd sort
    * beats the aggregator's kryo heap serialization; selectable per
    * deployment (Bench compares them, see BENCH notes). */
  def searchAgg(
      spark: org.apache.spark.sql.SparkSession,
      shardedPoints: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int,
      t: Int,
      distance: (Column, Column) => Column = l2Dist): DataFrame = {
    import spark.implicits._
    val routes = route(queries, centroids, t)
    val cands = shardedPoints
      .join(broadcast(routes), "shard_id")
      .select(col("qid"), col("id"),
        round(distance(col("qvec"), col("vec")), 4).as("dist"),
        col("shard_id").cast("int").as("shard_id"))
      .as[TopK.CandS]
    cands
      .groupByKey(_.qid)
      .agg(new TopK.TopKSAggregator(k).toColumn.name("nn"))
      .toDF("qid", "nn")
      .select(col("qid"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), col("n.dist").as("dist"),
        col("n.shard_id").as("shard_id"))
  }

  /** Probe-count sweep: routed top-k results for EVERY t in 1..maxT from a
    * single candidate pass — the recall-vs-nprobe evaluation curve
    * (recall.py run once per shard count in the reference; here one scan).
    *
    * Candidates are generated once at maxT with their producing
    * centroid_rank carried along. Per-t ranks all come from ONE window
    * sort: `rank_t = sum(crank <= t) over (qid order dist, id rows
    * unbounded preceding)` is the row's rank among only-those-candidates
    * produced by the first t routes — so maxT conditional running sums
    * share a single partition-by-qid sort instead of maxT separate
    * searches. Output: (t, qid, rank, neighbor_id, dist); for each t the
    * rows equal search(..., t = t) exactly (ShardingSpec asserts).
    *
    * Scale: identical shuffle footprint to ONE search at t = maxT (the
    * largest candidate set dominates any sweep); the per-t reranks are
    * free column arithmetic inside the same window operator.
    */
  def searchSweep(
      shardedPoints: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int,
      maxT: Int,
      distance: (Column, Column) => Column = l2Dist): DataFrame = {
    val routes = route(queries, centroids, maxT)
    val cands = shardedPoints
      .join(broadcast(routes), "shard_id")
      .withColumn("dist", round(distance(col("qvec"), col("vec")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankCols = (1 to maxT).map { t =>
      sum(when(col("centroid_rank") <= t, 1L).otherwise(0L)).over(w)
        .as(s"rk_$t")
    }
    val ranked = cands.select(
      Seq(col("qid"), col("id"), col("dist"), col("centroid_rank")) ++
        rankCols: _*)
    val perT = array((1 to maxT).map { t =>
      when(col("centroid_rank") <= t && col(s"rk_$t") <= k,
        struct(lit(t.toLong).as("t"),
          col(s"rk_$t").cast("int").as("rank")))
    }: _*)
    ranked
      .select(col("qid"), col("id").as("neighbor_id"), col("dist"),
        explode(filter(perT, e => e.isNotNull)).as("e"))
      .select(col("e.t").as("t"), col("qid"), col("e.rank").as("rank"),
        col("neighbor_id"), col("dist"))
  }

  /** Recall@k per sweep step: one semi-join against the exact result for
    * the WHOLE sweep, grouped by (t, qid), then averaged per t over the
    * full query grid (queries with zero hits count as zero). */
  def recallSweep(exact: DataFrame, sweep: DataFrame, k: Int, maxT: Int)
      : DataFrame = {
    val e = exact.select(col("qid"), col("neighbor_id"))
    val hits = sweep.select(col("t"), col("qid"), col("neighbor_id"))
      .join(e, Seq("qid", "neighbor_id"), "left_semi")
      .groupBy(col("t"), col("qid"))
      .agg(count(lit(1)).as("n_hits"))
    val grid = e.select(col("qid")).distinct()
      .crossJoin(broadcast(
        e.sparkSession.range(1, maxT + 1).select(col("id").as("t"))))
    grid
      .join(hits, Seq("t", "qid"), "left")
      .select(col("t"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .groupBy(col("t"))
      .agg(
        count(lit(1)).as("n_queries"),
        round(avg(col("n_hits") / k.toDouble), 6).as("recall"))
  }

  /** Recall@k of a routed result vs the exact result (recall.py:34-83
    * industrialized): per-query |routed ∩ exact| / k, then the mean. */
  def recallAtK(exact: DataFrame, routed: DataFrame, k: Int): DataFrame = {
    val e = exact.select(col("qid"), col("neighbor_id"))
    val r = routed.select(col("qid"), col("neighbor_id"))
    val hits = r.join(e, Seq("qid", "neighbor_id"), "left_semi")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_hits"))
    val allQ = e.select(col("qid")).distinct()
    allQ
      .join(hits, Seq("qid"), "left")
      .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .agg(
        count(lit(1)).as("n_queries"),
        round(avg(col("n_hits") / k.toDouble), 6).as("recall"))
  }
}
