package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Pq, ShardedSearch, Stats}

class PqSpec extends SparkSpec {
  lazy val pts = Tables.points(spark, sf0).cache()
  lazy val cb = Pq.fit(spark, pts, m = 8, dsub = 8, k = 8, iters = 1)
  lazy val codes = Pq.encode(pts, cb, m = 8, dsub = 8).cache()

  test("codebooks: m subspaces x k codewords of dsub dims") {
    val c = cb.collect()
    assert(c.length === 8 * 8)
    assert(c.forall(_.getSeq[Double](2).length === 8))
  }

  test("collectCodebooks tolerates dropped (empty) clusters via far sentinels") {
    import spark.implicits._
    // codebook with (sub 0, code 1) missing — the empty-cluster shape
    val gap = Seq(
      (0, 0, Seq(0.0, 0.0)), (0, 2, Seq(9.0, 9.0)),
      (1, 0, Seq(1.0, 1.0)), (1, 1, Seq(2.0, 2.0)), (1, 2, Seq(3.0, 3.0)))
      .toDF("sub", "code", "centroid")
    val lit = Pq.collectCodebooks(gap, m = 2, dsub = 2)
    assert(lit.k === 3)
    assert(lit.cents(0)(1).forall(_ == Double.MaxValue))
    // the sentinel never wins an encode argmin...
    val p = Seq((0L, Array(9.5f, 9.5f, 2.5f, 2.5f))).toDF("id", "vec")
    val enc = Pq.encodeWide(p, lit).select("codes").head().getSeq[Int](0)
    assert(enc === Seq(2, 1) || enc === Seq(2, 2)) // never code 1 in sub 0
    assert(enc(0) === 2)
    // ...and its LUT entries are +inf, so ADC can never rank it first
    val lut = Pq.lutFlat(Array(1f, 1f, 1f, 1f), lit)
    assert(lut(0 * 3 + 1).isInfinity)
    assert(lut.count(!_.isInfinity) === 5)
  }

  test("encode: every point gets one code per subspace") {
    assert(codes.count() === pts.count() * 8)
    val perSub = codes.groupBy("sub").count().collect()
    assert(perSub.length === 8 && perSub.forall(_.getLong(1) === pts.count()))
    // codes are within [0, k)
    assert(codes.where(col("code") < 0 || col("code") >= 8).count() === 0)
  }

  test("adc search: self-retrieval and recall above chance") {
    val qs = Tables.queryPoints(spark, sf0)
    val approx = Pq.adcSearch(qs, codes, cb, m = 8, dsub = 8, k = 10)
    val exact = Knn.knnExact(pts, qs, 10)
    val rec = ShardedSearch.recallAtK(exact, approx, 10).head().getDouble(1)
    // 8x8 codebooks on 64-dim gaussian data: coarse, but far above the
    // random baseline (10/500 = 0.02)
    assert(rec > 0.2, s"recall $rec")
    // the query's own point shares its codes -> approx dist is minimal
    val self = approx.where(col("rank") === 1 && col("qid") === col("neighbor_id"))
    assert(self.count() >= qs.count() / 2)
  }

  test("refine stage: exact re-rank beats raw ADC recall") {
    val qs = Tables.queryPoints(spark, sf0)
    val exact = Knn.knnExact(pts, qs, 10)
    val adc = Pq.adcSearch(qs, codes, cb, m = 8, dsub = 8, k = 10)
    val refined = Pq.adcRefine(qs, codes, cb, pts, m = 8, dsub = 8, k = 10, refine = 4)
    val rAdc = ShardedSearch.recallAtK(exact, adc, 10).head().getDouble(1)
    val rRef = ShardedSearch.recallAtK(exact, refined, 10).head().getDouble(1)
    assert(rRef >= rAdc, s"refine $rRef < adc $rAdc")
    assert(rRef > 0.35, s"refined recall $rRef") // wider pool + exact dist (k=8 codebooks)
    // refined distances are EXACT l2 of the returned ids
    import graft.functions.VectorFunctions._
    val check = refined.join(pts.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
      .join(qs, "qid")
      .where(round(l2Dist(col("qvec"), col("vec")), 4) =!= col("dist"))
    assert(check.count() === 0)
  }

  test("ivf-pq: routed ADC search returns ranked results per query") {
    val qs = Tables.queryPoints(spark, sf0)
    val cents = graft.operators.Sharding.fitCentroids(spark, pts, k = 4, iters = 2)
    val assigned = graft.operators.Sharding.assign(pts, cents)
    val routes = ShardedSearch.route(qs, cents, t = 2)
    val cand = routes.join(assigned, "shard_id").select(col("qid"), col("id"))
    val res = Pq.adcSearchRouted(qs, cand, codes, cb, m = 8, dsub = 8, k = 10)
    assert(res.groupBy("qid").count().agg(max("count")).head().getLong(0) <= 10)
    assert(res.count() > 0)
    // routed candidates only: every result id is in the candidate set
    assert(res.join(cand, Seq("qid"), "left_anti").count() === 0)
  }

  lazy val cbLit = Pq.collectCodebooks(cb, m = 8, dsub = 8)
  lazy val qarr = Tables.queryPoints(spark, sf0).collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

  test("literal-LUT strategy: encodeWide/codesLong row-identical to encode") {
    val wide = Pq.encodeWide(pts, cbLit)
    assert(Pq.codesLong(wide).except(codes).count() === 0)
    assert(codes.except(Pq.codesLong(wide)).count() === 0)
  }

  test("literal-LUT strategy: adcSearchLit row-identical to adcSearch") {
    val wide = Pq.encodeWide(pts, cbLit).cache()
    val qs = Tables.queryPoints(spark, sf0)
    val rel = Pq.adcSearch(qs, codes, cb, m = 8, dsub = 8, k = 10)
    val lit = Pq.adcSearchLit(qarr, wide, cbLit, k = 10)
    assert(lit.except(rel).count() === 0)
    assert(rel.except(lit).count() === 0)
    // refine too: exact re-rank over the literal approx stage
    val relRef = Pq.adcRefine(qs, codes, cb, pts, m = 8, dsub = 8, k = 10, refine = 4)
    val litRef = Pq.adcRefineLit(qarr, wide, cbLit, pts, k = 10, refine = 4)
    assert(litRef.except(relRef).count() === 0)
    assert(relRef.except(litRef).count() === 0)
    wide.unpersist()
  }

  test("literal-LUT strategy: adcSearchRoutedLit row-identical to adcSearchRouted") {
    val wide = Pq.encodeWide(pts, cbLit)
    val qs = Tables.queryPoints(spark, sf0)
    val cents = graft.operators.Sharding.fitCentroids(spark, pts, k = 4, iters = 2)
    val assigned = graft.operators.Sharding.assign(pts, cents)
    val routes = ShardedSearch.route(qs, cents, t = 2)
    val cand = routes.join(assigned, "shard_id").select(col("qid"), col("id"))
    val rel = Pq.adcSearchRouted(qs, cand, codes, cb, m = 8, dsub = 8, k = 10)
    val lit = Pq.adcSearchRoutedLit(qarr, cand, wide, cbLit, k = 10)
    assert(lit.except(rel).count() === 0)
    assert(rel.except(lit).count() === 0)
  }

  test("ivfSearchLit + routeLit row-identical to the relational routed search") {
    val qs = Tables.queryPoints(spark, sf0)
    val cents = graft.operators.Sharding.fitCentroids(spark, pts, k = 4, iters = 2)
    val centArr = cents.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    // driver routing matches the relational route window exactly
    val relRoutes = ShardedSearch.route(qs, cents, t = 2)
      .select(col("qid"), col("shard_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val litRoutes = Pq.routeLit(qarr, centArr, t = 2).sorted
    assert(litRoutes.toSeq === relRoutes.toSeq)
    // and the IVF search over the carried-assignment layout matches the
    // relational candidates form
    val assigned = graft.operators.Sharding.assignLit(pts, centArr)
    val cand = ShardedSearch.route(qs, cents, t = 2)
      .join(assigned, "shard_id").select(col("qid"), col("id"))
    val rel = Pq.adcSearchRouted(qs, cand, codes, cb, m = 8, dsub = 8, k = 10)
    val ivfCodes = Pq.encodeWide(
      graft.operators.Sharding.assignLit(pts, centArr, keepVec = true),
      cbLit, carry = Seq("shard_id"))
    val lit = Pq.ivfSearchLit(qarr, litRoutes, ivfCodes, cbLit, k = 10)
    assert(lit.except(rel).count() === 0)
    assert(rel.except(lit).count() === 0)
  }

  test("buddy_up permutation composes with PQ (BuddyPQ shape)") {
    val perm = SparkEntry.Params.evensOddsPerm
    import graft.functions.VectorFunctions.permute
    val permuted = pts.select(col("id"), permute(col("vec"), perm).as("vec"))
    val cb2 = Pq.fit(spark, permuted, m = 8, dsub = 8, k = 8, iters = 1)
    val codes2 = Pq.encode(permuted, cb2, m = 8, dsub = 8)
    assert(codes2.count() === pts.count() * 8)
  }
}
