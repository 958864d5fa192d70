package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphAnn, Sharding, ShardedSearch}

class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  // driver replay of the engine's 4-dp distance: Spark's round() is
  // HALF_UP — math.rint (half-even) would flake on a distance landing
  // exactly on a 5e-5 boundary
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def l2r4(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    for (i <- a.indices) { val v = a(i).toDouble - b(i).toDouble; s += v * v }
    r4(math.sqrt(s))
  }

  // small fixture: the beam operator composes `rounds` join+distinct
  // stages into ONE plan, so a saturated-ef test over the full table
  // would spend minutes in planning alone
  private lazy val pts = Tables.points(spark, sf0).where(col("id") < 150)
    .localCheckpoint()
  private lazy val cents = Sharding.fitCentroids(spark, pts, k = 3, iters = 2)
    .localCheckpoint()
  private lazy val sharded = pts
    .join(Sharding.assign(pts, cents).select("id", "shard_id"), "id")
    .select(col("shard_id"), col("id"), col("vec"))
    .localCheckpoint()
  private lazy val queries = Tables.queryPoints(spark, sf0, stride = 25)
    .where(col("qid") < 150).localCheckpoint()

  test("buildShardGraph: adjacency is the exact per-shard kNN with id tie-break") {
    val deg = 3
    val adj = GraphAnn.buildShardGraph(sharded, deg).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // brute-force replay on the driver
    val all = sharded.select(col("shard_id"), col("id"), col("vec")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val expected = all.flatMap { case (sid, id, v) =>
      all.filter(o => o._1 == sid && o._2 != id)
        .map(o => (l2r4(v, o._3), o._2))
        .sorted.take(deg)
        .map { case (_, nbr) => (sid, id, nbr) }
    }
    assert(adj.toSet === expected.toSet)
    // every node has exactly min(deg, shardSize-1) out-edges
    val shardSizes = all.groupBy(_._1).map { case (sid, xs) => sid -> xs.length }
    val outDeg = adj.groupBy(x => (x._1, x._2)).map { case (k, xs) => k -> xs.length }
    outDeg.foreach { case ((sid, _), n) =>
      assert(n === math.min(deg, shardSizes(sid) - 1))
    }
  }

  test("beamSearch visits only routed shards and equals the exhaustive scan when the beam covers the shard") {
    val adj = GraphAnn.buildShardGraph(sharded, degree = 8)
    val ep = GraphAnn.entryPoints(sharded, cents, e = 4)
    val routes = ShardedSearch.route(queries, cents, t = 2)
      .select(col("qid"), col("qvec"), col("shard_id"))
    // ef larger than any shard and enough rounds: the beam must become the
    // exhaustive routed scan IF the graph is connected enough; with ef >=
    // shard size the frontier IS the whole visited set, so after enough
    // rounds everything reachable from the entries is evaluated
    val maxShard = sharded.groupBy("shard_id").count()
      .agg(max("count")).head().getLong(0).toInt
    val beam = GraphAnn.beamSearch(sharded, adj, ep, routes,
      k = 10, ef = maxShard, rounds = 5)
    val scan = ShardedSearch.search(sharded, queries, cents, k = 10, t = 2)
    val b = beam.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val sc = scan.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // graph reachability can in principle drop isolated points; on this
    // data the saturated beam reproduces the scan exactly
    assert(b === sc)
    // routed-shard containment: no result may come from an un-routed shard
    val routedSet = routes.select("qid", "shard_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    GraphAnn.beamSearch(sharded, adj, ep, routes, k = 10, ef = 4, rounds = 2)
      .select(col("qid"), col("shard_id")).collect()
      .foreach(r => assert(routedSet.contains((r.getLong(0), r.getInt(1)))))
  }

  test("beamSearch is deterministic and ranks (rounded dist, id)") {
    val adj = GraphAnn.buildShardGraph(sharded, degree = 4)
    val ep = GraphAnn.entryPoints(sharded, cents, e = 2)
    val routes = ShardedSearch.route(queries, cents, t = 2)
      .select(col("qid"), col("qvec"), col("shard_id"))
    def run() = GraphAnn.beamSearch(sharded, adj, ep, routes,
      k = 5, ef = 4, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val a = run()
    assert(a === run())
    // ranks are dense 1..k' per query and ordered by (dist, id)
    a.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.toSeq.sortBy(_._2)
      assert(byRank.map(_._2) === (1 to byRank.size))
      val sorted = byRank.sortBy(x => (x._4, x._3))
      assert(sorted.map(_._2) === (1 to byRank.size))
    }
  }

  test("beamVisitExact: materialized rounds equal the composed DAG row for row") {
    // r11 materializes each beam round (the composed plan duplicated the
    // visited subtree 2^rounds); materialization must be invisible in the
    // result — pin equality against the composed form
    val adj = GraphAnn.buildShardGraph(sharded, degree = 4)
    val ep = GraphAnn.entryPoints(sharded, cents, e = 2)
    val routes = ShardedSearch.route(queries, cents, t = 2)
      .select(col("qid"), col("qvec"), col("shard_id"))
    def rows(materialize: Boolean) =
      GraphAnn.beamVisitExact(sharded, adj, ep, routes, ef = 4, rounds = 3,
          materializeRounds = materialize)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(rows(materialize = true) === rows(materialize = false))
  }

  test("insertBatch is byte-identical to a from-scratch rebuild over the union") {
    val deg = 5
    val centArr = cents.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val batch = pts.where(col("id") % 7 === 0)
      .select((col("id") + 10000).as("id"), col("vec"))
    val aB = Sharding.assignLit(batch, centArr, keepVec = true)
      .select(col("shard_id"), col("id"), col("vec")).localCheckpoint()
    val adj = GraphAnn.buildShardGraph(sharded, deg)
    val inc = GraphAnn.insertBatch(sharded, adj, aB, deg).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val full = GraphAnn.buildShardGraph(sharded.unionByName(aB), deg).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(inc === full)
    // and the batch really changed the graph (old lists were re-cut)
    val old = adj.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(old.exists(e => !inc.contains(e)), "no old edge was displaced — vacuous test")
  }

  test("deleteBatch equals the driver replay of the FreshDiskANN repair rule") {
    val deg = 4
    val adj = GraphAnn.buildShardGraph(sharded, deg).localCheckpoint()
    val del = pts.where(col("id") % 5 === 2).select(col("id"))
    val delIds = del.as[Long].collect().toSet
    val got = GraphAnn.deleteBatch(sharded, adj, del, deg).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // driver replay: drop, two-hop candidates, exact dist, re-cut
    val all = sharded.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val vecOf = all.map(x => x._2 -> x._3).toMap
    val adjRows = adj.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val surv = adjRows.filter(e => !delIds(e._2) && !delIds(e._3))
    val lost = adjRows.filter(e => !delIds(e._2) && delIds(e._3))
    val viaLists = adjRows.filter(e => delIds(e._2) && !delIds(e._3))
    val cands = (for {
      (sid, src, via, _) <- lost
      (vsid, vvia, cand, _) <- viaLists
      if vsid == sid && vvia == via && cand != src
    } yield (sid, src, cand)).distinct
      .map { case (sid, src, cand) => (sid, src, cand, l2r4(vecOf(src), vecOf(cand))) }
    val expected = (surv ++ cands).distinct
      .groupBy(e => (e._1, e._2)).values.flatMap { es =>
        es.sortBy(e => (e._4, e._3)).take(deg)
      }.toSet
    assert(got === expected)
    // the deletion actually damaged lists (otherwise the test is vacuous)
    assert(lost.nonEmpty)
  }

  test("deleteBatch invariants: no deleted refs, untouched lists identical, degree bound") {
    val deg = 4
    val adj = GraphAnn.buildShardGraph(sharded, deg).localCheckpoint()
    val del = pts.where(col("id") % 5 === 2).select(col("id"))
    val delIds = del.as[Long].collect().toSet
    val out = GraphAnn.deleteBatch(sharded, adj, del, deg).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.foreach { case (_, src, dst, _) =>
      assert(!delIds(src) && !delIds(dst))
    }
    out.groupBy(e => (e._1, e._2)).foreach { case (_, es) =>
      assert(es.length <= deg)
    }
    // sources that lost nothing keep byte-identical lists
    val adjRows = adj.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val damaged = adjRows.filter(e => delIds(e._3)).map(_._2).toSet
    val untouchedBefore = adjRows
      .filter(e => !delIds(e._2) && !damaged(e._2)).toSet
    val untouchedAfter = out
      .filter(e => !damaged(e._2)).toSet
    assert(untouchedAfter === untouchedBefore)
  }

  test("deleteBatch planted line: repair finds the true next-nearest; unreachable deficit is honest") {
    // 1-D geometry in the leading coordinate: a=0, b=1, c=1.2, d=30
    def v(x: Float) = Array.fill(8)(0f).updated(0, x)
    val synth = Seq(
      (0, 1L, v(0f)), (0, 2L, v(1f)), (0, 3L, v(1.2f)), (0, 4L, v(30f)))
      .toDF("shard_id", "id", "vec")
    // degree 1: adj = 1->2, 2->3, 3->2, 4->3
    val adj = GraphAnn.buildShardGraph(synth, degree = 1)
    val out = GraphAnn.deleteBatch(synth, adj, Seq(2L).toDF("id"), degree = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // node 1 lost 2, reconnects through 2's list {3} — the TRUE nearest
    // survivor; node 3's only candidate is itself, so it ends with an
    // empty list (the documented repair boundary); node 4 is untouched
    assert(out === Set((0, 1L, 3L, 1.2), (0, 4L, 3L, 28.8)))
  }

  test("churnHealth: zero on healthy geometry; the planted repair boundary and 1-point shards are counted") {
    // healthy: every full-shard build leaves every point a non-empty list
    // (every spec shard has >= 2 points), so orphan counts are all zero
    val adj = GraphAnn.buildShardGraph(sharded, degree = 3)
    val h0 = GraphAnn.churnHealth(sharded, adj).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val layoutSizes = sharded.groupBy("shard_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h0.map(_._1).toSet === layoutSizes.keySet)
    h0.foreach { case (sid, n, orph) =>
      assert(n === layoutSizes(sid)); assert(orph === 0L)
    }
    // planted line (the deleteBatch boundary test's geometry): deleting
    // node 2 leaves node 3 with an EMPTY list — the docstring's orphan is
    // now a counted row, not a recipe. Shard 1's single point has no
    // possible same-shard neighbor: orphaned by construction, counted too
    def v(x: Float) = Array.fill(8)(0f).updated(0, x)
    val synth = Seq(
      (0, 1L, v(0f)), (0, 2L, v(1f)), (0, 3L, v(1.2f)), (0, 4L, v(30f)),
      (1, 9L, v(5f)))
      .toDF("shard_id", "id", "vec")
    val adj1 = GraphAnn.buildShardGraph(synth, degree = 1)
    val survivors = synth.where(col("id") =!= 2L)
    val repaired = GraphAnn.deleteBatch(synth, adj1, Seq(2L).toDF("id"), degree = 1)
    val h1 = GraphAnn.GraphIndex(survivors, repaired, spark.emptyDataFrame)
      .health.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(h1 === Set((0, 3L, 1L), (1, 1L, 1L)))
  }

  test("serveGraphAnn: results across MULTIPLE micro-batches equal the batch probe") {
    import graft.operators.Streaming
    val base = java.nio.file.Files.createTempDirectory("graft_serv_spec").toString
    // persist a tiny index for the serving query to probe
    val layoutP = s"$base/layout"
    sharded.write.partitionBy("shard_id").parquet(layoutP)
    GraphAnn.buildShardGraph(sharded, degree = 4)
      .write.partitionBy("shard_id").parquet(s"$base/adj")
    GraphAnn.entryPoints(sharded, cents, e = 2).write.parquet(s"$base/ep")
    val centArr = cents.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    // the workload arrives as TWO files -> the file source feeds them as
    // separate micro-batches (maxFilesPerTrigger=1)
    val qs = queries.select(col("qid"), col("qvec"))
    qs.where(col("qid") % 50 === 0).write.parquet(s"$base/incoming/a")
    qs.where(col("qid") % 50 =!= 0).write.parquet(s"$base/incoming/b")
    val stream = spark.readStream.schema(qs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$base/incoming/*")
    val q = Streaming.serveGraphAnn(stream, layoutP, s"$base/adj", s"$base/ep",
      centArr, k = 5, t = 2, ef = 4, rounds = 2,
      s"$base/results", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val served = spark.read.parquet(s"$base/results").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    // batch reference over the SAME artifacts and workload
    val routes = ShardedSearch.route(qs, cents, t = 2)
      .select(col("qid"), col("qvec"), col("shard_id"))
    val batchRes = GraphAnn.beamSearch(
      spark.read.parquet(layoutP), spark.read.parquet(s"$base/adj"),
      spark.read.parquet(s"$base/ep"), routes, k = 5, ef = 4, rounds = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(served === batchRes)
  }

  test("repairEntryPoints: damage-local repair equals the full recompute over survivors") {
    val e = 3
    val ep = GraphAnn.entryPoints(sharded, cents, e).localCheckpoint()
    // delete every 4th point — hits some entries, misses others, so both
    // the recompute arm and the untouched-pass-through arm are exercised
    val del = pts.where(col("id") % 4 === 1).select(col("id"))
    val delIds = del.as[Long].collect().toSet
    val epRows = ep.collect().map(r => (r.getInt(0), r.getLong(1)))
    val damagedShards = epRows.filter(x => delIds(x._2)).map(_._1).toSet
    assert(damagedShards.nonEmpty, "no entry deleted — vacuous test")
    assert(epRows.exists(x => !damagedShards(x._1)), "every shard damaged — pass-through arm untested")
    val surv = sharded.join(del.withColumnRenamed("id", "del_id"),
      col("id") === col("del_id"), "left_anti")
      .select(col("shard_id"), col("id"), col("vec"))
    val repaired = GraphAnn.repairEntryPoints(ep, sharded, cents, del, e)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val full = GraphAnn.entryPoints(surv, cents, e)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(repaired === full)
    assert(repaired.forall(x => !delIds(x._2)))
  }

  test("deleteIndex: post-delete search answers with every shard's nearest entry deleted; naive ghost entries lose seeds") {
    val deg = 6; val e = 2
    val adj = GraphAnn.buildShardGraph(sharded, deg).localCheckpoint()
    val ep = GraphAnn.entryPoints(sharded, cents, e).localCheckpoint()
    // deletion set: each shard's RANK-1 entry point plus every 7th id —
    // the exact scenario where an unrepaired entry table seeds the beam
    // on ghosts
    val rank1 = GraphAnn.entryPoints(sharded, cents, e = 1).select(col("id"))
    val del = pts.where(col("id") % 7 === 3).select(col("id"))
      .unionByName(rank1).distinct().localCheckpoint()
    val delIds = del.as[Long].collect().toSet
    val idx = GraphAnn.deleteIndex(sharded, adj, ep, cents, del, deg, e)
    val routes = ShardedSearch.route(queries, cents, t = 2)
      .select(col("qid"), col("qvec"), col("shard_id"))
    val res = GraphAnn.beamSearch(idx.points, idx.adjacency, idx.entries,
      routes, k = 5, ef = 6, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // no ghost anywhere: results, entries, layout, adjacency
    res.foreach { case (_, _, nid) => assert(!delIds(nid)) }
    idx.entries.collect().foreach(r => assert(!delIds(r.getLong(1))))
    idx.points.collect().foreach(r => assert(!delIds(r.getLong(1))))
    idx.adjacency.collect().foreach { r =>
      assert(!delIds(r.getLong(1)) && !delIds(r.getLong(2)))
    }
    // every routed query still gets answers after losing its best seeds
    val qids = routes.select("qid").distinct().as[Long].collect().toSet
    assert(res.map(_._1) === qids)
    // the NAIVE composition (repaired adjacency + pruned layout, entry
    // table left with ghosts) drops the deleted seeds silently — the
    // bug deleteIndex exists to prevent
    val naive = GraphAnn.beamSearch(idx.points, idx.adjacency, ep,
      routes, k = 5, ef = 6, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(naive !== res, "ghost entries changed nothing — vacuous scenario")
  }

  test("refreshEntryPoints: insert-side refresh equals the full recompute over the union") {
    val e = 3
    val ep = GraphAnn.entryPoints(sharded, cents, e).localCheckpoint()
    val centArr = cents.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    // a batch that lands in SOME shards only, so both the recompute arm
    // and the pass-through arm are exercised — and at least one new point
    // must displace a current entry (otherwise the refresh is vacuous)
    val batch = pts.where(col("id") % 6 === 0)
      .select((col("id") + 20000).as("id"), col("vec"))
    val aB = Sharding.assignLit(batch, centArr, keepVec = true)
      .select(col("shard_id"), col("id"), col("vec")).localCheckpoint()
    val touched = aB.select("shard_id").distinct().as[Int].collect().toSet
    val refreshed = GraphAnn.refreshEntryPoints(ep, sharded, cents, aB, e)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val full = GraphAnn.entryPoints(sharded.unionByName(aB), cents, e)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(refreshed === full)
    val old = ep.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(refreshed !== old, "no entry displaced — vacuous refresh")
    // untouched shards byte-identical
    assert(refreshed.filter(x => !touched(x._1)) === old.filter(x => !touched(x._1)))
  }

  test("churn: recall vs the exhaustive scan holds across insert/delete cycles (local repair does not decay)") {
    val deg = 6; val e = 2; val cycles = 4
    val centArr = cents.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    var cur = sharded
    var adj = GraphAnn.buildShardGraph(sharded, deg).localCheckpoint()
    var ep = GraphAnn.entryPoints(sharded, cents, e).localCheckpoint()
    val routes = ShardedSearch.route(queries, cents, t = 2)
      .select(col("qid"), col("qvec"), col("shard_id")).localCheckpoint()
    def recallNow(): Double = {
      val beam = GraphAnn.beamSearch(cur, adj, ep, routes,
        k = 5, ef = 10, rounds = 4)
        .select(col("qid"), col("neighbor_id"))
      val scan = ShardedSearch.search(cur, queries, cents, k = 5, t = 2)
        .select(col("qid"), col("neighbor_id"))
      val hits = beam.intersect(scan).count().toDouble
      hits / scan.count()
    }
    val recalls = Vector.newBuilder[Double]
    recalls += recallNow()
    for (i <- 1 to cycles) {
      // insert: a fresh batch re-using base geometry under new ids
      val batch = pts.where(col("id") % 9 === i % 9)
        .select((col("id") + 10000L * i).as("id"), col("vec"))
      val aB = Sharding.assignLit(batch, centArr, keepVec = true)
        .select(col("shard_id"), col("id"), col("vec")).localCheckpoint()
      val ii = GraphAnn.insertIndex(cur, adj, ep, cents, aB, deg, e)
      cur = ii.points.localCheckpoint()
      adj = ii.adjacency.localCheckpoint()
      ep = ii.entries.localCheckpoint()
      // delete: a slice of the CURRENT ids (old and new alike)
      val del = cur.where(col("id") % 11 === (i * 3) % 11).select(col("id"))
        .localCheckpoint()
      val idx = GraphAnn.deleteIndex(cur, adj, ep, cents, del, deg, e)
      cur = idx.points.localCheckpoint()
      adj = idx.adjacency.localCheckpoint()
      ep = idx.entries.localCheckpoint()
      recalls += recallNow()
    }
    val rs = recalls.result()
    // local repair's whole claim: recall does not decay across cycles
    rs.foreach(r => assert(r >= 0.85, s"recall dropped below floor: $rs"))
    assert(rs.last >= rs.head - 0.1, s"recall decayed across churn: $rs")
  }

  test("dedup-first restores beam reachability on a duplicate-clique geometry (the q184/SCALE.md remedy)") {
    import graft.operators.Dedup
    // three angularly-separated families of 4 near-identical points in
    // ONE shard: every point's exact degree-3 list is exactly its own
    // family, so the graph is three disjoint cliques and a beam can
    // never leave its entry family — the duplicate-heavy navigability
    // failure ChurnBench measured at 10×. Collapsing families to
    // representatives (the engine's own embedding near-dup pass) makes
    // every region reachable with the SAME beam budget.
    def fam(axis: Int, ids: Seq[Long]): Seq[(Int, Long, Array[Float])] =
      ids.zipWithIndex.map { case (id, j) =>
        (0, id, Array.fill(8)(0f).updated(axis, 5f)
          .updated((axis + 4) % 8, 0.01f * (j + 1)))
      }
    val pts = fam(0, Seq(1L, 2L, 3L, 4L)) ++ fam(1, Seq(11L, 12L, 13L, 14L)) ++
      fam(2, Seq(21L, 22L, 23L, 24L))
    val synth = pts.toDF("shard_id", "id", "vec")
    val adj = GraphAnn.buildShardGraph(synth, degree = 3)
    // the full graph IS three cliques: every edge stays within a family
    val famOf = (id: Long) => id / 10
    adj.collect().foreach(r =>
      assert(famOf(r.getLong(1)) === famOf(r.getLong(2)), "cross-family edge"))
    val entries = Seq((0, 1L)).toDF("shard_id", "id") // seed inside family 0
    val q = Seq((0L, Array.fill(8)(0f).updated(1, 5f).toSeq, 0))
      .toDF("qid", "qvec", "shard_id") // query NEAR family 1
    val full = GraphAnn.beamSearch(synth, adj, entries, q,
      k = 6, ef = 4, rounds = 3).collect().map(_.getLong(2))
    // trapped: only family 0 (the entry's) is ever visited
    assert(full.map(famOf).toSet === Set(0L))
    // dedup first: the engine's own near-dup pass collapses each family
    // to its id-min representative; the rebuilt graph is fully connected
    val dupIds = Dedup.embeddingNearDups(
      synth.select(col("id"), col("vec")), threshold = 0.99)
      .select(col("id_b").as("id")).distinct()
    val keepers = synth.join(dupIds, Seq("id"), "left_anti")
      .select(col("shard_id"), col("id"), col("vec"))
    assert(keepers.collect().map(_.getLong(1)).toSet === Set(1L, 11L, 21L))
    val adjK = GraphAnn.buildShardGraph(keepers, degree = 3)
    val got = GraphAnn.beamSearch(keepers, adjK, entries, q,
      k = 3, ef = 4, rounds = 3).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    // same budget, every family reachable — and ranked by true distance
    // to the query (family 1's representative first)
    assert(got.map(_._2).toSet === Set(1L, 11L, 21L))
    assert(got.find(_._1 == 1).map(_._2) === Some(11L))
  }

  test("entryPoints: e nearest the shard centroid, id tie-break") {
    val e = 3
    val got = GraphAnn.entryPoints(sharded, cents, e).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val cm = cents.collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val all = sharded.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val expected = all.groupBy(_._1).toSeq.flatMap { case (sid, xs) =>
      val c = cm(sid)
      xs.map { case (_, id, v) =>
        var s = 0.0
        for (i <- v.indices) { val d = v(i).toDouble - c(i); s += d * d }
        (r4(math.sqrt(s)), id)
      }.sorted.take(e).map { case (_, id) => (sid, id) }
    }.toSet
    assert(got === expected)
  }
}
