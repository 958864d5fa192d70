package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Driver-side codebook value: `cents(sub)(code)` = centroid (dsub
    * doubles). m·k·dsub doubles total — the artifact a PQ engine pins in
    * memory on every node; here it rides the serialized plan as literals
    * (identical distribution cost at this size). */
  final case class CodebookLit(m: Int, dsub: Int, k: Int,
      cents: Array[Array[Array[Double]]])

  /** Collect a fitted codebook DataFrame (`fit` output) to a [[CodebookLit]].
    *
    * Lloyd's can drop a cluster (no member points — e.g. duplicate
    * subvectors among the first-k init points), leaving a (sub, code) gap
    * the fit output simply omits. A gap slot is filled with a
    * far-sentinel codeword (MaxValue components): no point encodes to it
    * (argmin can't pick a sentinel over any real codeword) and no code
    * references it, so encode/ADC results are identical to the relational
    * forms that join only existing codewords — instead of an NPE at plan
    * construction. */
  def collectCodebooks(codebooks: DataFrame, m: Int, dsub: Int): CodebookLit = {
    val rows = codebooks.collect()
    val k = rows.map(_.getInt(1)).max + 1
    val cents = Array.ofDim[Array[Double]](m, k)
    rows.foreach { r =>
      cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    for (s <- 0 until m; c <- 0 until k)
      if (cents(s)(c) == null)
        cents(s)(c) = Array.fill(dsub)(Double.MaxValue)
    CodebookLit(m, dsub, k, cents)
  }

  /** Driver replica of the codegen l2Sq kernel (VectorExpressions.L2SqDistance):
    * left-to-right double accumulation in array order — bit-identical. */
  private def l2SqDriver(q: Array[Float], c: Array[Double], off: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) {
      val d = q(off + i).toDouble - c(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Flat ADC lookup table for one query: `lut(sub*k + code)` = exact
    * squared subspace distance from the query's sub-vector to that codeword. */
  def lutFlat(qvec: Array[Float], cb: CodebookLit): Array[Double] = {
    val out = new Array[Double](cb.m * cb.k)
    var s = 0
    while (s < cb.m) {
      var c = 0
      while (c < cb.k) {
        out(s * cb.k + c) = l2SqDriver(qvec, cb.cents(s)(c), s * cb.dsub)
        c += 1
      }
      s += 1
    }
    out
  }

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

  // --------------------------------------------------------------------
  // Literal-LUT physical strategy. The relational forms above join the
  // codes against a Spark-computed LUT — the right plan when the query
  // batch is itself big data. For interactive batches (the reference caps
  // queries at MAXIMUM_QUERIES, kanndi_search.py:8) the LUT is a driver
  // artifact of m·k doubles per query, so the whole search collapses to
  // ONE map stage over the codes table + ONE top-k shuffle: no LUT
  // subquery, no broadcast-exchange job, no (sub,code) join fan-out of
  // |codes|·|Q| intermediate rows, no re-aggregation. Same math, same
  // rounding, same output — PqSpec asserts row-identity with the
  // relational forms. Scale note: the per-query LUT literals total
  // |Q|·m·k doubles in the plan; beyond a few thousand queries switch
  // back to the relational form (plan size / task-serialization cost
  // grows linearly with |Q|).
  // --------------------------------------------------------------------

  /** Map-only wide encode: (id, codes: array<int>) with codes(sub) = argmin
    * codeword under the engine ranking convention (rounded dist, code
    * tie-break) — row-identical to `encode` reshaped wide. No shuffle: the
    * codebooks ride the plan as literals, each code is an array_min over a
    * k-element literal comparison, and the 100 TB raw-vector scan is
    * touched exactly once. */
  def encodeWide(points: DataFrame, cb: CodebookLit, carry: Seq[String] = Nil): DataFrame = {
    val codes = array((0 until cb.m).map { s =>
      val cands = array((0 until cb.k).map { c =>
        struct(
          round(l2Dist(subvec(col("vec"), s, cb.dsub),
            typedLit(cb.cents(s)(c).toSeq)), 4).as("d"),
          lit(c).as("code"))
      }: _*)
      array_min(cands).getField("code")
    }: _*)
    points.select(col("id") +: carry.map(col) :+ codes.as("codes"): _*)
  }

  /** Long-form (id, sub, code) view of `encodeWide` output — the format
    * `encode` emits and the q43 oracle replays. */
  def codesLong(wide: DataFrame): DataFrame =
    wide.select(col("id"), posexplode(col("codes")).as(Seq("sub", "code")))

  /** ADC candidate distance from a wide codes row and a flat LUT column:
    * round(sqrt(Σ_sub lut[sub·k + codes[sub]]), 4), summed in sub order. */
  private def adcDistCol(codes: Column, lut: Column, m: Int, k: Int): Column =
    round(sqrt((0 until m).map { s =>
      element_at(lut, lit(s * k + 1) + element_at(codes, s + 1))
    }.reduce(_ + _)), 4)

  /** The literal qid -> flat-LUT map for a driver query batch — the
    * composition surface other operators (GraphAnn's PQ-probe annotator,
    * SparkEntry q103) use to price a codes row for a query:
    * `adcDist(codes, element_at(lutMapLit(qs, cb), qid), cb)`. */
  def lutMapLit(queries: Array[(Long, Array[Float])], cb: CodebookLit): Column =
    typedLit(queries.map { case (qid, qvec) => qid -> lutFlat(qvec, cb).toSeq }.toMap)

  /** Public face of [[adcDistCol]] for composition with a [[lutMapLit]]
    * lookup. */
  def adcDist(codes: Column, lut: Column, cb: CodebookLit): Column =
    adcDistCol(codes, lut, cb.m, cb.k)

  /** Per-query (qid, lut) literal structs, qid-sorted for determinism. */
  private def qlutLits(queries: Array[(Long, Array[Float])], cb: CodebookLit) =
    queries.sortBy(_._1).map { case (qid, qvec) =>
      struct(lit(qid).as("qid"), typedLit(lutFlat(qvec, cb).toSeq).as("lut"))
    }

  /** ADC top-k with literal LUTs: one map stage (explode |Q| structs per
    * codes row, unrolled m-term lookup sum) + one top-k window shuffle
    * (WindowGroupLimit pushes the rank filter partial). Output matches
    * `adcSearch`. */
  def adcSearchLit(
      queries: Array[(Long, Array[Float])],
      codesWide: DataFrame,
      cb: CodebookLit,
      k: Int): DataFrame = {
    val exploded = codesWide
      .select(col("id"), col("codes"), explode(array(qlutLits(queries, cb): _*)).as("q"))
      .select(col("q.qid").as("qid"), col("id"),
        adcDistCol(col("codes"), col("q.lut"), cb.m, cb.k).as("approx_dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("approx_dist"), col("id"))
    exploded
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("approx_dist"))
  }

  /** IVF-PQ with literal LUTs: the candidate equi-join keeps only the routed
    * (qid, id) pairs; the LUT rides the plan as a qid-keyed map literal, so
    * no per-(sub,code) join or re-aggregation is needed. Output matches
    * `adcSearchRouted`. */
  def adcSearchRoutedLit(
      queries: Array[(Long, Array[Float])],
      candidates: DataFrame, // (qid, id)
      codesWide: DataFrame,
      cb: CodebookLit,
      k: Int): DataFrame = {
    val lutMap = typedLit(queries.map { case (qid, qvec) =>
      qid -> lutFlat(qvec, cb).toSeq
    }.toMap)
    val dists = candidates
      .join(codesWide, "id")
      .select(col("qid"), col("id"),
        adcDistCol(col("codes"), element_at(lutMap, col("qid")), cb.m, cb.k)
          .as("approx_dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("approx_dist"), col("id"))
    dists
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("approx_dist"))
  }

  /** Spark-identical round(x, 4): Round uses BigDecimal HALF_UP on the
    * double's shortest decimal form — replicated so driver-side routing
    * ranks exactly like the relational window. */
  private def round4Driver(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Driver-side top-T centroid routing — the reference's in-memory
    * centroid index (kanndi_search.py:28-44: the router is RAM-resident and
    * queries are a bounded batch). Ranking matches ShardedSearch.route:
    * (round(l2, 4), shard_id) ascending. Returns (qid, shard_id) pairs. */
  def routeLit(
      queries: Array[(Long, Array[Float])],
      cents: Array[(Int, Array[Double])],
      t: Int): Array[(Long, Int)] =
    queries.flatMap { case (qid, qvec) =>
      cents.map { case (sid, c) => (round4Driver(math.sqrt(l2SqDriver(qvec, c, 0))), sid) }
        .sorted.take(t).map { case (_, sid) => (qid, sid) }
    }

  /** IVF-PQ search over the materialized index layout: `ivfCodes` is the
    * codes table CARRYING its shard assignment (id, shard_id, codes) — the
    * IVF index IS codes-partitioned-by-list, so search is one broadcast
    * equi-join of the driver-computed routes against the index, a literal
    * LUT lookup sum, and one top-k shuffle. Row-identical to
    * `adcSearchRouted` over the same routing (PqSpec). */
  def ivfSearchLit(
      queries: Array[(Long, Array[Float])],
      routes: Array[(Long, Int)],
      ivfCodes: DataFrame, // (id, shard_id, codes)
      cb: CodebookLit,
      k: Int): DataFrame = {
    // routes as a shard_id -> [qid] plan literal: the routed "join" becomes
    // a partition-prunable isin filter + a generator over the map lookup —
    // no broadcast exchange, no join operator, same row multiplicity
    val byShard: Map[Int, Seq[Long]] =
      routes.groupBy(_._2).map { case (sid, ps) => sid -> ps.map(_._1).sorted.toSeq }
    val shardQids = typedLit(byShard)
    val lutMap = typedLit(queries.map { case (qid, qvec) =>
      qid -> lutFlat(qvec, cb).toSeq
    }.toMap)
    val dists = ivfCodes
      .where(col("shard_id").isin(byShard.keys.toSeq: _*))
      .select(col("id"), col("codes"),
        explode(element_at(shardQids, col("shard_id"))).as("qid"))
      .select(col("qid"), col("id"),
        adcDistCol(col("codes"), element_at(lutMap, col("qid")), cb.m, cb.k)
          .as("approx_dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("approx_dist"), col("id"))
    dists
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("approx_dist"))
  }

  /** ADC + exact re-rank with literal LUTs and a qid-keyed literal query
    * map for the refine distances — the raw vectors are touched only for
    * the |Q|·k·refine candidate ids. Output matches `adcRefine`. */
  def adcRefineLit(
      queries: Array[(Long, Array[Float])],
      codesWide: DataFrame,
      cb: CodebookLit,
      points: DataFrame,
      k: Int,
      refine: Int = 4): DataFrame = {
    val approx = adcSearchLit(queries, codesWide, cb, k * refine)
    val cand = approx.select(col("qid"), col("neighbor_id").as("id"))
    val qvecMap = typedLit(queries.map { case (qid, qvec) => qid -> qvec.toSeq }.toMap)
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    points
      .join(broadcast(cand), "id")
      .withColumn("dist", round(l2Dist(element_at(qvecMap, col("qid")), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("neighbor_id"), col("dist"))
  }
}
