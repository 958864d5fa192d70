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

  /** Hard-negative mining for contrastive training: per query, the top-k
    * NEAREST points whose label DIFFERS from the query's — the
    * highest-loss negatives an embedding-model trainer wants in-batch.
    *
    * Shape = [[knnExact]] with the label predicate applied BEFORE any
    * distance math (the filter prunes candidates inside the same codegen
    * stage as the broadcast join — no wasted distance kernels), and the
    * same WindowGroupLimit partial top-k. Output carries the negative's
    * label for batch-construction bookkeeping.
    */
  def hardNegatives(
      points: DataFrame, // (id, vec, label)
      queries: DataFrame, // (qid, qvec, qlabel)
      k: Int,
      distance: (Column, Column) => Column = l2Dist): DataFrame = {
    val joined = points
      .join(broadcast(queries))
      .where(col("label") =!= col("qlabel"))
      .withColumn("dist", round(distance(col("qvec"), col("vec")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    joined
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
        col("label").as("neg_label"), col("dist"))
  }

  /** Approximate kNN GRAPH construction (the neighbor lists a graph-based
    * ANN index builds on): SRP-bucket the corpus, rank same-bucket
    * neighbors by exact cosine per source point, keep top-k. One
    * bucket-keyed self-equi-join — never an all-pairs product; recall
    * rises with nProj the usual LSH way (more, smaller buckets at scale).
    * Output: (src_id, rank, nbr_id, cosine), rank by (cosine desc, id).
    */
  def knnGraph(points: DataFrame, k: Int, nProj: Int = 8, dim: Int = 64)
      : DataFrame = {
    val b = points
      .withColumn("bucket", Dedup.srpBucket(col("vec"), nProj, dim))
    val a = b.select(col("id").as("src_id"), col("vec").as("src_vec"),
      col("bucket"))
    val n = b.select(col("id").as("nbr_id"), col("vec").as("nbr_vec"),
      col("bucket"))
    val pairs = a.join(n, Seq("bucket"))
      .where(col("src_id") =!= col("nbr_id"))
      .withColumn("cosine",
        roundHU(cosineSim(col("src_vec"), col("nbr_vec")), 4))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("src_id"), col("rank"), col("nbr_id"), col("cosine"))
  }

  /** Integer PageRank over a directed edge list (data-cartography
    * importance scoring over the [[knnGraph]]: high-rank points sit in
    * dense well-connected neighborhoods; the score drives diversity-aware
    * selection and coreset pruning of training data).
    *
    * All arithmetic is int64 so every round is bit-stable across engines:
    * s_0(v) = scale, and s_{t+1}(v) = floor(scale·(100−dampPct)/100) +
    * floor(dampPct · Σ_{u→v} floor(s_t(u)/outdeg(u)) / 100). Per-edge
    * floor-DIV before the sum keeps the total order-independent; the
    * damping base needs no node count, so no driver scalar at all.
    *
    * Scale shape: `rounds` is a FIXED small constant, so all rounds
    * compose into ONE plan of score-to-edge equi-joins + per-node partial
    * aggs — no driver loop state, no checkpoints to leak. Pass a PINNED
    * edge frame (the q107-index discipline): each round re-scans it, so
    * the caller decides whether that scan is a cached block or a live
    * recompute.
    *
    * @param edges (src_id, nbr_id) directed edges
    * @return (id, score) after `rounds` iterations, one row per node that
    *         appears on either side of an edge */
  def pageRank(
      edges: DataFrame,
      rounds: Int = 5,
      scale: Long = 1000000L,
      dampPct: Int = 85): DataFrame = {
    require(rounds >= 1 && dampPct >= 0 && dampPct <= 100,
      s"pageRank: need rounds >= 1 and dampPct in [0,100], got $rounds/$dampPct")
    val base = scale * (100 - dampPct) / 100
    val nodes = edges.select(col("src_id").as("id"))
      .unionByName(edges.select(col("nbr_id").as("id"))).distinct()
    val deg = edges.groupBy(col("src_id")).agg(count(lit(1)).as("deg"))
    val ed = edges.join(deg, Seq("src_id"))
    var scores = nodes.select(col("id"), lit(scale).as("score"))
    for (_ <- 1 to rounds) {
      val contrib = ed
        .join(scores.withColumnRenamed("id", "src_id"), Seq("src_id"))
        .select(col("nbr_id").as("id"), expr("score DIV deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_sum"))
      scores = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"coalesce(in_sum, 0L) * $dampPct DIV 100")).as("score"))
    }
    scores
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

  /** Matryoshka / truncated-dimension search: coarse-rank every point by
    * L2 over the FIRST `prefixDim` dims only (matryoshka-trained
    * embeddings front-load information, so the prefix is itself a valid
    * low-d embedding), keep the top k·refine per query, then re-rank
    * those exactly at full dimension — the fourth compression scheme next
    * to PQ (q43), SQ8 (q51) and BQ (q128), with zero training artifacts.
    *
    * Scale shape: the coarse stage is the q02 broadcast-scan (partial
    * top-k via WindowGroupLimit), but arithmetic is prefixDim/dim of the
    * exact scan's; a cluster deployment materializes the prefix as its
    * own column (or a separate truncated table) so the coarse scan READS
    * prefixDim/dim of the bytes too. Raw full-dim vectors enter only via
    * the candidate equi-join (the q128 refine discipline).
    *
    * Output: (qid, rank, neighbor_id, dist, pdist) — rank by rounded
    * exact distance, id tie-break. */
  def matryoshka(
      points: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      prefixDim: Int,
      k: Int,
      refine: Int): DataFrame =
    matryoshkaCore(
      points.select(col("id"), slice(col("vec"), 1, prefixDim).as("pvec")),
      points.select(col("id"), col("vec")),
      queries, prefixDim, k, refine)

  /** The shared coarse-rank + exact-refine kernel behind [[matryoshka]]
    * (prefix sliced in flight) and [[matryoshkaStored]] (prefix read from
    * its own stored column): ONE implementation owns the rounding, the
    * (pdist, id) / (dist, id) tie-breaks, the k·refine cut, and the
    * output projection, so the two variants cannot drift apart — the
    * byte-identity the q141 oracle and KnnSpec equality test pin. */
  private def matryoshkaCore(
      coarseSrc: DataFrame, // (id, pvec)
      refineSrc: DataFrame, // (id, vec)
      queries: DataFrame, // (qid, qvec)
      prefixDim: Int,
      k: Int,
      refine: Int): DataFrame = {
    val coarse = coarseSrc
      .join(broadcast(queries
        .select(col("qid"), slice(col("qvec"), 1, prefixDim).as("pqvec"))))
      .withColumn("pdist", round(l2Dist(col("pqvec"), col("pvec")), 4))
    val wc = Window.partitionBy(col("qid")).orderBy(col("pdist"), col("id"))
    val cand = coarse
      .withColumn("crank", row_number().over(wc))
      .where(col("crank") <= k * refine)
      .select(col("qid"), col("id"), col("pdist"))
    val ref = cand
      .join(refineSrc, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("dist", round(l2Dist(col("qvec"), col("vec")), 4))
    val wr = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    ref
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"),
        col("dist"), col("pdist"))
  }

  /** [[matryoshka]] over a MATERIALIZED prefix column: `stored` is the
    * written layout `(id, pvec, vec)` where `pvec = vec[0, prefixDim)` was
    * sliced once at write time. The coarse stage selects only (id, pvec),
    * so parquet column pruning makes the scan READ prefixDim/dim of the
    * vector bytes (not just compute on a slice of rows it fully read —
    * the I/O claim the in-flight [[matryoshka]] scaladoc defers to the
    * layout); the refine stage re-reads only (id, vec) for the k·refine
    * candidates via the equi-join. Same output contract as [[matryoshka]]
    * — byte-identical results, cheaper coarse scan. */
  def matryoshkaStored(
      stored: DataFrame, // (id, pvec, vec)
      queries: DataFrame, // (qid, qvec)
      prefixDim: Int,
      k: Int,
      refine: Int): DataFrame =
    matryoshkaCore(
      stored.select(col("id"), col("pvec")),
      stored.select(col("id"), col("vec")),
      queries, prefixDim, k, refine)

  /** Mutual (reciprocal) kNN consensus filter over a directed neighbor
    * edge list: keep exactly the pairs present in BOTH directions. The
    * asymmetric edges a kNN graph produces around hubness (a hub is
    * everyone's neighbor, but reciprocates few) are the usual false
    * near-dup/link candidates; mutuality is the standard cheap filter.
    * One self-equi-join ON THE PAIR KEY — candidate-set sized, never
    * corpus-sized. Output: (id_a, id_b), id_a < id_b, one row per
    * mutual pair. */
  def mutualEdges(edges: DataFrame): DataFrame = // (src_id, nbr_id)
    edges
      .join(
        edges.select(col("src_id").as("r_src"), col("nbr_id").as("r_nbr")),
        col("src_id") === col("r_nbr") && col("nbr_id") === col("r_src"))
      .where(col("src_id") < col("nbr_id"))
      .select(col("src_id").as("id_a"), col("nbr_id").as("id_b"))

  /** Wedge + triangle census over an undirected (id_a < id_b) edge set
    * (the [[mutualEdges]] output). A wedge is an unordered neighbor pair
    * {u < v} at a center m (enumerated by self-joining the symmetrized
    * adjacency on the center); it is CLOSED when (u, v) is itself an
    * edge. Every triangle closes exactly one wedge at each of its three
    * centers, so n_triangles = closed/3 exactly, and the global
    * clustering coefficient is closed/wedges = 3·n_triangles/n_wedges.
    * Two equi-joins + one aggregate, candidate-sized throughout, never a
    * cross product.
    *
    * Scale note: per-center fan-out is degree², the known cost of wedge
    * enumeration; the standard skew mitigation samples or splits hub
    * centers. A kNN graph has degree ≤ k by construction, so the plain
    * enumeration is already bounded at k²·|V|. */
  def triangleStats(und: DataFrame): DataFrame = {
    val adj = und.select(col("id_a").as("m"), col("id_b").as("n"))
      .unionByName(und.select(col("id_b").as("m"), col("id_a").as("n")))
    val wedges = adj
      .join(adj.select(col("m").as("m2"), col("n").as("v")),
        col("m") === col("m2") && col("n") < col("v"))
      .select(col("n").as("u"), col("v"))
    wedges
      .join(und.select(col("id_a").as("u2"), col("id_b").as("v2")),
        col("u") === col("u2") && col("v") === col("v2"), "left")
      .agg(
        count(lit(1)).as("n_wedges"),
        (count(col("u2")) / 3).cast("long").as("n_triangles"))
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
