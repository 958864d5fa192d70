package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

class KnnSpec extends SparkSpec {

  test("knnExact returns k ascending neighbors per query, self first") {
    val res = Knn
      .knnExact(Tables.points(spark, sf0), Tables.queryPoints(spark, sf0), k = 10)
      .cache()
    val qids = Tables.queryPoints(spark, sf0).count()
    assert(res.count() === qids * 10)
    // every query's rank-1 neighbor is itself at distance 0 (query set is a
    // stride of the points)
    val r1 = res.where(col("rank") === 1)
    assert(r1.where(col("qid") === col("neighbor_id")).count() === qids)
    assert(r1.agg(max(col("dist"))).head().getDouble(0) === 0.0)
    // distances nondecreasing in rank
    val bad = res
      .groupBy(col("qid"))
      .agg(
        max(struct(col("rank"), col("dist"))).getField("dist").as("last"),
        min(struct(col("rank"), col("dist"))).getField("dist").as("first"))
      .where(col("last") < col("first"))
    assert(bad.count() === 0)
  }

  test("nearest agrees with knnExact rank 1") {
    val k1 = Knn
      .knnExact(Tables.points(spark, sf0), Tables.queryPoints(spark, sf0), k = 1)
      .select(col("qid"), col("neighbor_id"), col("dist"))
    val n = Knn.nearest(Tables.points(spark, sf0), Tables.queryPoints(spark, sf0))
    assert(k1.except(n).count() === 0 && n.except(k1).count() === 0)
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("hardNegatives = knnExact over the label-filtered candidate set") {
    val p = Tables.embeddings(spark, sf0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val qs = p.where(col("id") % 50 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("label").as("qlabel")).cache()
    val hn = Knn.hardNegatives(p, qs, k = 5).cache()
    // no negative shares its query's label
    val labels = p.select(col("id").as("neighbor_id"), col("label"))
    val qlabels = qs.select(col("qid"), col("qlabel"))
    val joined = hn.join(labels, "neighbor_id").join(qlabels, "qid")
    assert(joined.where(col("label") === col("qlabel")).count() === 0)
    // per query: equals knnExact run against only the differently-labeled
    // points for that query's label
    val someQ = qs.limit(3).collect()
    for (q <- someQ) {
      val qid = q.getLong(0)
      val qlabel = q.getInt(2)
      val filtered = p.where(col("label") =!= qlabel).select("id", "vec")
      val exact = Knn.knnExact(filtered,
        qs.where(col("qid") === qid), k = 5)
        .select(col("qid"), col("rank"), col("neighbor_id"), col("dist"))
      val mine = hn.where(col("qid") === qid)
        .select(col("qid"), col("rank"), col("neighbor_id"), col("dist"))
      assert(mine.exceptAll(exact).isEmpty && exact.exceptAll(mine).isEmpty,
        s"qid=$qid")
    }
    hn.unpersist(); qs.unpersist()
  }

  test("knnGraph: no self-edges, <= k ranked neighbors, bucket-consistent") {
    val pts = Tables.points(spark, sf0)
    val g = Knn.knnGraph(pts, k = 3).cache()
    assert(g.where(col("src_id") === col("nbr_id")).count() === 0)
    val perSrc = g.groupBy("src_id").count()
    assert(perSrc.agg(max("count")).head().getLong(0) <= 3L)
    // ranks are dense from 1 and cosine nonincreasing in rank
    val bad = g.groupBy("src_id")
      .agg(max(struct(col("rank"), col("cosine"))).getField("cosine").as("last"),
        min(struct(col("rank"), col("cosine"))).getField("cosine").as("first"))
      .where(col("last") > col("first"))
    assert(bad.count() === 0)
    // every edge joins two points of the same SRP bucket
    import graft.operators.Dedup
    val bk = pts.withColumn("bucket", Dedup.srpBucket(col("vec"), 8, 64))
      .select(col("id"), col("bucket"))
    val withB = g.join(bk.withColumnRenamed("id", "src_id")
        .withColumnRenamed("bucket", "src_b"), "src_id")
      .join(bk.withColumnRenamed("id", "nbr_id")
        .withColumnRenamed("bucket", "nbr_b"), "nbr_id")
    assert(withB.where(col("src_b") =!= col("nbr_b")).count() === 0)
    g.unpersist()
  }

  test("pageRank: hand-computed rounds, sink and source nodes") {
    import spark.implicits._
    // 1->2, 2->1, 2->3, 3->1; deg 1/2/1, scale 1e6, damp 85, base 150000
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src_id", "nbr_id")
    val r2 = Knn.pageRank(edges, rounds = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    // round 1: in_sum 1:1500000, 2:1000000, 3:500000
    //   -> s1 1:1425000, 2:1000000, 3:575000
    // round 2: in_sum 1:1075000, 2:1425000, 3:500000
    //   -> s2 1:1063750, 2:1361250, 3:575000
    assert(r2 === Map(1L -> 1063750L, 2L -> 1361250L, 3L -> 575000L))
    // a pure source keeps only the damping base; its sink collects 85%
    val line = Seq((5L, 6L)).toDF("src_id", "nbr_id")
    val r1 = Knn.pageRank(line, rounds = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r1 === Map(5L -> 150000L, 6L -> 1000000L))
  }

  test("matryoshka with prefixDim = full dim recovers knnExact exactly") {
    val pts = Tables.points(spark, sf0)
    val qs = Tables.queryPoints(spark, sf0)
    val got = Knn.matryoshka(pts, qs, prefixDim = 64, k = 5, refine = 2)
      .select(col("qid"), col("rank"), col("neighbor_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val want = Knn.knnExact(pts, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want)
  }

  test("matryoshka: refine re-orders the coarse candidates by exact distance") {
    import spark.implicits._
    // prefix (first 2 dims) ranks b closest to q, but full-dim ranks a
    // closest -- refine must flip them; c is pruned at the coarse cut
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f, 10.0f)),  // a: pdist 0, dist 10
      (2L, Seq(0.1f, 0.0f, 0.0f, 0.0f)),   // b: pdist 0.1, dist 0.1
      (3L, Seq(5.0f, 5.0f, 0.0f, 0.0f)))   // c: pruned (k*refine=2)
      .toDF("id", "vec")
    val qs = Seq((9L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val got = Knn.matryoshka(pts, qs, prefixDim = 2, k = 2, refine = 1)
      .select(col("rank"), col("neighbor_id"), col("dist"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(got === Seq((1, 2L, 0.1), (2, 1L, 10.0)))
  }

  test("matryoshkaStored over a written (id, pvec, vec) layout equals the in-flight variant") {
    val pts = Tables.points(spark, sf0)
    val qs = Tables.queryPoints(spark, sf0)
    val path = java.nio.file.Files.createTempDirectory("mrl_spec").toString
    pts.select(col("id"), slice(col("vec"), 1, 16).as("pvec"), col("vec"))
      .write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    val got = Knn.matryoshkaStored(stored, qs, prefixDim = 16, k = 5, refine = 4)
      .collect().map(key).toSet
    val want = Knn.matryoshka(pts, qs, prefixDim = 16, k = 5, refine = 4)
      .collect().map(key).toSet
    assert(got === want)
    // and the coarse scan is pruned to the prefix column (the layout's point)
    val plan = Knn.matryoshkaStored(stored, qs, prefixDim = 16, k = 5, refine = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,pvec:array<float>>"))
  }

  test("triangleStats: hand-counted wedges and triangles on a known graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus pendant 5-1: wedges (a<b<c, middle b):
    // K4 contributes C(4,3)*... enumerate: every ordered a<b<c with
    // (a,b),(b,c) edges. K4 edges: all 6 pairs; pendant edge (1,5).
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L)).toDF("id_a", "id_b")
    val r = Knn.triangleStats(und).head()
    // wedges = neighbor pairs per center: node 1 has neighbors {2,3,4,5}
    // -> C(4,2)=6; nodes 2,3,4 each have 3 neighbors -> 3*C(3,2)=9;
    // node 5 is a leaf -> 0. Total 15. Triangles: C(4,3)=4 in K4 (each
    // closing one wedge at each of its 3 centers -> 12 closed wedges);
    // clustering coefficient 12/15 = 0.8.
    assert((r.getLong(0), r.getLong(1)) === ((15L, 4L)))
  }

  test("mutualEdges keeps exactly the reciprocal pairs, a < b once") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (2L, 1L),   // mutual
      (1L, 3L),             // one-way (hub pattern)
      (4L, 5L), (5L, 4L))   // mutual
      .toDF("src_id", "nbr_id")
    val got = Knn.mutualEdges(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (4L, 5L)))
  }
}
