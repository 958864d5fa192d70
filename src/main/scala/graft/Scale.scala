package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE EVIDENCE harness (SCALE.md's measured half).
  *
  * Every 100 TB claim in SCALE.md is a design argument asserted over plans
  * (Audit); this main turns the headline claims into measured scaling
  * exponents by replicating the sf0.1 testdata N× and timing the headline
  * queries at 1×, 10× and 100×.
  *
  * == Replication model (ScaleGen) ==
  *
  * A 100× corpus is NOT 100 copies of the same rows — that would turn every
  * document into a 100-way duplicate (quadratic LSH buckets that no real
  * corpus has) and every vector into a 100-way exact tie. Replica `r` of
  * the base data is offset so the union behaves like a corpus that GREW:
  *
  *  - Fact/dim keys get disjoint per-replica ranges (`+ r·base`), base a
  *    power of ten above the key's max — each replica is a self-contained
  *    shard of the star schema, so per-key join fan-outs stay constant
  *    while table sizes scale. region/nation (5/25 rows) stay single-copy:
  *    dimensions don't grow with fact volume.
  *  - PROBE WORKLOADS STAY FIXED: the search/phrase/BM25 query batches are
  *    stride-derived (`id % 25 == 0`, `% 100 == 0`), so replica doc/vec
  *    ids map through f(j) = j + j/24 + 1 — the j-th positive integer NOT
  *    divisible by 25 (each 24-block maps to consecutive ints, then skips
  *    the next multiple of 25; bases are multiples of 25). Replica 0 keeps
  *    original ids. Corpus ×N, query batch ×1 — the benchmark contract a
  *    real cluster is sized against.
  *  - Replica texts (r>0) are renamed through a per-replica VOCABULARY
  *    BIJECTION π_r (vocab sorted by a deterministic (word, r) hash,
  *    zipped against alphabetical order) with the ORIGINAL word order
  *    kept. Each replica is then exactly isomorphic to the base corpus —
  *    near-dup structure, shingle/winnowing spans, and band sizes all
  *    replicate 1:1 (dup RATE and candidate volume scale ×N, the honest
  *    shape) — while cross-replica shingles only collide when two
  *    independent permutations agree on a whole n-gram (~V^-n: no
  *    phantom 100-way dups). Unigram df still grows ×N through shared
  *    vocab, so postings-probe costs scale realistically. (The first cut
  *    word-SHUFFLED each replica into one hash-canonical order; that
  *    collapsed the shingle space onto sorted word subsets and measured
  *    a 1000× candidate blow-up at 10× — a generator artifact no grown
  *    corpus has, hence the bijection design.)
  *  - Replica embeddings (r>0) get deterministic ±0.02 per-coordinate
  *    jitter (coordinate σ is 0.125): cluster geometry preserved, exact
  *    ties broken.
  *
  * == What scales with N (ScaleBench) ==
  *
  * `-Dgraft.shards` = 8·N: shard COUNT grows with the corpus, shard SIZE
  * stays bounded — the real cluster knob, and what keeps the per-shard
  * all-pairs graph build linear in the corpus. Probe-side work for the
  * routed searches (t=2 shards × bounded size × fixed batch) should then
  * be ~flat; corpus-scan operators (exact kNN, dedup, phrase index) are
  * expected ~linear. Deviations from those shapes are the finding.
  *
  * Env: SPARK_GRAFT_SCALES (default "1,10,100"), SPARK_GRAFT_SCALE_PASSES
  * (default 2), SPARK_GRAFT_SCALE_QUERIES (substring filter),
  * SPARK_GRAFT_SF_DIR (base, default sf0.1), SPARK_GRAFT_SCALE_OUT
  * (default target/scale). Run with SPARK_DRIVER_MEM=32g for 100×.
  */
object ScaleGen {
  /** j-th positive integer not divisible by 25 (see scaladoc above). */
  private def skip25(id: org.apache.spark.sql.Column) =
    id + floor(id / lit(24)).cast("long") + lit(1L)

  /** Replica-offset id: original for rep 0; r·base + f(id) (never ≡0 mod
    * 25) for probe-bearing tables, r·base + id for plain fact keys. */
  private def offId(id: String, rep: org.apache.spark.sql.Column, base: Long,
      probeSafe: Boolean): org.apache.spark.sql.Column = {
    require(base % 25 == 0, s"base $base must be a multiple of 25")
    val shifted =
      if (probeSafe) rep * lit(base) + skip25(col(id))
      else rep * lit(base) + col(id)
    when(rep === 0, col(id)).otherwise(shifted).as(id)
  }

  def generate(s: SparkSession, src: String, n: Int, out: String): Unit = {
    import java.nio.file.{Files, Paths}
    val done = Paths.get(out, "_DONE")
    if (Files.exists(done)) return
    val t0 = System.nanoTime()
    val rep = col("rep")
    def reps(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(s.range(n).toDF("rep")))
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
    def tbl(name: String) = s.read.parquet(s"$src/$name.parquet")

    // dimensions: single copy — they don't grow with fact volume
    write(tbl("region"), "region", 1)
    write(tbl("nation"), "nation", 1)

    write(reps(tbl("customer")).select(
      offId("c_custkey", rep, 100000L, probeSafe = false),
      col("c_name"), col("c_nationkey"), col("c_acctbal"),
      col("c_mktsegment")), "customer", math.max(4, n / 4))
    write(reps(tbl("supplier")).select(
      offId("s_suppkey", rep, 10000L, probeSafe = false),
      col("s_name"), col("s_nationkey"), col("s_acctbal")),
      "supplier", math.max(2, n / 10))
    write(reps(tbl("part")).select(
      offId("p_partkey", rep, 100000L, probeSafe = false),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), "part", math.max(4, n / 4))
    write(reps(tbl("orders")).select(
      offId("o_orderkey", rep, 1000000L, probeSafe = false),
      offId("o_custkey", rep, 100000L, probeSafe = false),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders", math.max(8, n / 2))
    write(reps(tbl("lineitem")).select(
      offId("l_orderkey", rep, 1000000L, probeSafe = false),
      offId("l_partkey", rep, 100000L, probeSafe = false),
      offId("l_suppkey", rep, 10000L, probeSafe = false),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem", math.max(16, n))
    write(reps(Tables.events(s, src)).select(
      offId("event_id", rep, 1000000L, probeSafe = false),
      col("ts"),
      offId("user_id", rep, 10000L, probeSafe = false),
      col("event_type"), col("value"), col("props")),
      "events", math.max(8, n / 2))

    // documents: probe-safe ids; replica texts renamed through a
    // per-replica VOCABULARY BIJECTION with the original word order kept
    // (see the replication-model scaladoc). The base is 1e6 (not 1e5-
    // adjacent) so the dedup queries' planted-dup ids (`id + 100000`)
    // can never collide with a replica's real id range.
    val vocab = tbl("documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .distinct().orderBy("w")
      .collect().map(_.getString(0))
    require(vocab.length <= 100000,
      s"vocab ${vocab.length} too large to permute driver-side")
    def permHash(w: String, r: Int): Long =
      // deterministic across JVMs (unlike String.hashCode collisions-wise
      // this is fine too, but MurmurHash3 mixes better on tiny vocabs)
      scala.util.hashing.MurmurHash3.stringHash(w, r + 0x9e3779b9) & 0xffffffffL
    val vocabMaps = (0 until n).map { r =>
      val permuted = vocab.sortBy(w => (permHash(w, r), w))
      (r, vocab.zip(permuted).toMap)
    }
    val wmapDf = broadcast(s.createDataFrame(
      s.sparkContext.parallelize(vocabMaps, 1)).toDF("rep", "wmap"))
    val renamed = array_join(
      transform(split(col("text"), " "),
        w => when(length(w) === 0, w)
          .otherwise(coalesce(element_at(col("wmap"), w), w))),
      " ")
    write(reps(tbl("documents")).join(wmapDf, "rep").select(
      offId("doc_id", rep, 1000000L, probeSafe = true),
      when(rep === 0, col("text")).otherwise(renamed).as("text"),
      col("lang"), col("source"), col("n_chars")),
      "documents", math.max(4, n / 4))

    // embeddings: probe-safe ids; replica vectors jittered ±0.02 per
    // coordinate (deterministic in (vec_id, rep, coordinate)); base 1e6
    // for the same planted-dup-id reason as documents
    val jittered = transform(col("embedding"), (x, j) =>
      (x + ((pmod(xxhash64(col("vec_id"), rep, j), lit(1001L)) - lit(500L))
        .cast("double") / lit(500.0) * lit(0.02))).cast("float"))
    write(reps(tbl("embeddings")).select(
      offId("vec_id", rep, 1000000L, probeSafe = true),
      when(rep === 0, col("embedding")).otherwise(jittered).as("embedding"),
      col("label")), "embeddings", math.max(4, n / 4))

    Files.write(done, java.util.Arrays.asList(n.toString))
    System.err.println(
      f"[scale] generated x$n at $out in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}

/** BOUNDED-STATE evidence (SCALE.md's streaming-state table): the wall-clock
  * scaling of the streaming family is measured by [[ScaleBench]], but the
  * claim that actually matters at 100 TB/day — "state = horizon × rate /
  * active keys, never history" — needs its own measurement. This main runs
  * the three canonical stateful pipelines over the 1×/10×/100× events
  * replicas as REAL multi-batch streams (the 30-day span split into 15
  * two-day time-ordered files, maxFilesPerTrigger=1, so the watermark
  * ratchets through the span and eviction actually happens mid-stream)
  * and records
  * `stateOperators.numRowsTotal` (and RocksDB SST bytes) per micro-batch
  * from the progress reports.
  *
  * What the numbers must show:
  *  - dedup(1 day): max live state ≈ keys within horizon + one batch span,
  *    a FIXED FRACTION of the feed at every scale — and halving the
  *    horizon (the 12 h row) drops max state while events are unchanged,
  *    the causal half of the claim.
  *  - sessions: max state ≈ users with an open session (≈ active users),
  *    orders of magnitude below events; closed sessions evict.
  *  - profiles: max state ≈ un-flushed (user, type) entries, bounded by
  *    active users × |types|, cleared by the flush timer.
  *
  * Env: SPARK_GRAFT_SCALES (default "1,10,100"), SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_SCALE_OUT (replica location, as ScaleBench). */
object StateBench {
  import org.apache.spark.sql.DataFrame
  import graft.operators.Streaming

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "/root/repo/target/scale")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed scans report their sortBy order (writeBucketed
      // guarantees the one-file-per-bucket layout that makes the claim
      // sound), so bucket-side SMJ sorts are elided (r12, guide SS2.4)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }

    var lines = Vector.empty[String]
    for (n <- scales) {
      val dir = if (n == 1) src else s"$outBase/x$n"
      if (n > 1) ScaleGen.generate(spark, src, n, dir)
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("value"))
      val nEvents = ev.count()
      val nUsers = ev.select("user_id").distinct().count()

      // the feed: 15 time-ordered files (2 days each over the 30-day span)
      // so the stream sees a ratcheting watermark and mid-stream eviction;
      // the 2-day batch granularity keeps the live-state window (batch
      // span + horizon) small enough that halving the dedup horizon is
      // visible in the numbers
      val feedBase = s"/tmp/graft_statebench_x$n"
      val root = new java.io.File(feedBase)
      if (root.exists) del(root)
      val dayMs = 86400000L
      val t0ms = ev.agg(min(unix_millis(col("ts")))).collect()(0).getLong(0)
      var known = Set.empty[String]
      for (b <- 0 until 15) {
        val lo = t0ms + b * 2 * dayMs
        val hi = t0ms + (b + 1) * 2 * dayMs
        ev.where(unix_millis(col("ts")) >= lo &&
            (unix_millis(col("ts")) < hi || lit(b == 14)))
          .coalesce(1).write.mode("append").parquet(s"$feedBase/feed")
        // strictly increasing mtimes = deterministic batch order (the
        // shared helper SparkEntry.stampBatch — one definition, both feeds)
        known = SparkEntry.stampBatch(s"$feedBase/feed", known, b)
      }
      def feed(): DataFrame =
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$feedBase/feed")

      // run one pipeline, return (max numRowsTotal per operator,
      // max rocksdb sst bytes, wall secs)
      def run(tag: String)(pipe: DataFrame => DataFrame): (Long, Long, Double) = {
        val ck = s"$feedBase/ckpt_$tag"
        val w0 = System.nanoTime()
        val q = pipe(feed())
          .writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", ck)
          .start()
        try q.processAllAvailable() finally q.stop()
        val wall = (System.nanoTime() - w0) / 1e9
        val sos = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
        val maxRows = if (sos.isEmpty) 0L else sos.map(_.numRowsTotal).max
        // store footprint: the provider-agnostic memoryUsedBytes, or the
        // RocksDB SST total where the store flushed to disk
        val maxSst =
          if (sos.isEmpty) 0L
          else sos.map(so =>
            math.max(so.memoryUsedBytes,
              Option(so.customMetrics.get("rocksdbSstFileSize"))
                .map(_.longValue).getOrElse(0L))).max
        System.err.println(f"[state x$n] $tag%-12s state_max=$maxRows%9d " +
          f"sst_max=${maxSst / 1024}%8d KiB  wall=$wall%7.1f s")
        (maxRows, maxSst, wall)
      }

      val dedup1d = run("dedup_1d")(f =>
        Streaming.dedupWithinWatermark(f, keys = Seq("event_id")))
      // halved horizon, same events: max state must drop — the causal
      // half of "state = horizon × rate"
      val dedup12h = run("dedup_12h")(f =>
        Streaming.dedupWithinWatermark(f, keys = Seq("event_id"),
          watermark = "12 hours"))
      val sessions = run("sessions")(f =>
        Streaming.timedSessions(f.drop("event_type")).toDF())
      val profiles = run("profiles")(f =>
        Streaming.userProfiles(f.drop("event_id")).toDF())

      def j(t: (Long, Long, Double)) =
        s"""{"state_rows_max":${t._1},"sst_bytes_max":${t._2},"wall_s":${f"${t._3}%.1f"}}"""
      val line = s"""{"scale":$n,"events":$nEvents,"users":$nUsers,""" +
        s""""dedup_1d":${j(dedup1d)},"dedup_12h":${j(dedup12h)},""" +
        s""""sessions":${j(sessions)},"profiles":${j(profiles)}}"""
      println(line)
      lines :+= line
    }
    // persist the full run as a per-round artifact (SCALE.md's
    // bounded-state table cites this file; a state-size regression shows
    // as a diff here, not only in a one-off prose table)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target/state_last.json"),
        lines.mkString("[", ",\n ", "]\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}

/** STEADY-STATE CHURN at data scale (SCALE.md's graph-maintenance table):
  * GraphAnnSpec's non-decay churn property measured over the FULL corpus
  * at 1× and 10× — `cycles` alternating insert/delete cycles over the
  * graph index, recording per-cycle maintenance wall, recall_vs_scan
  * after every cycle, and the orphan-health metric ([[graft.operators
  * .GraphAnn.churnHealth]]).
  *
  * Recall is reported TWICE per cycle: over the MAINTAINED index and
  * over a from-scratch REBUILD of the same post-cycle point set. The
  * delta is the metric — absolute recall drifts with corpus size (the
  * net-growing index dilutes a fixed ef/rounds beam budget, a capacity
  * effect a rebuild suffers identically), so "local repair does not
  * decay" means maintained ≈ rebuilt at every cycle, not that the raw
  * number stays flat. (Insert-side maintenance is provably the rebuild;
  * any gap is deleteBatch's two-hop repair boundary.) What the numbers
  * must show:
  *  - per-cycle wall ~FLAT in the cycle number — the damage-local repair
  *    accumulates no debt (each cycle's work is the batch's damage, not
  *    index age);
  *  - recall(maintained) ≈ recall(rebuilt) at every cycle (one cycle is
  *    q178's claim; k cycles is FreshDiskANN's steady-state claim);
  *  - orphaned sources ≈ 0 (else the cycle loop would be the thing
  *    silently thinning the graph).
  *
  * Env: SPARK_GRAFT_SCALES (default "1,10"), SPARK_GRAFT_CHURN_CYCLES
  * (default 5), SPARK_GRAFT_SF_DIR / SPARK_GRAFT_SCALE_OUT /
  * SPARK_GRAFT_CPUS as ScaleBench. Writes target/churn_last.json. */
object ChurnBench {
  import graft.operators.{GraphAnn, Sharding, ShardedSearch}

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "/root/repo/target/scale")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val cycles = sys.env.get("SPARK_GRAFT_CHURN_CYCLES").map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed scans report their sortBy order (writeBucketed
      // guarantees the one-file-per-bucket layout that makes the claim
      // sound), so bucket-side SMJ sorts are elided (r12, guide SS2.4)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val deg = SparkEntry.Params.graphDegree
    val e = SparkEntry.Params.graphEntries
    var lines = Vector.empty[String]
    for (n <- scales) {
      val dir = if (n == 1) src else s"$outBase/x$n"
      if (n > 1) ScaleGen.generate(spark, src, n, dir)
      // shard COUNT scales with the corpus (the ScaleBench discipline),
      // so per-shard maintenance work stays bounded
      val shards = 8 * n
      val pts = Tables.points(spark, dir).localCheckpoint()
      val maxId = pts.agg(max(col("id"))).head().getLong(0)
      val cents = Sharding.fitCentroids(spark, pts, k = shards,
        iters = SparkEntry.Params.iters).localCheckpoint()
      val centArr = cents.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      val b0 = System.nanoTime()
      var cur = Sharding.assignLit(pts, centArr, keepVec = true)
        .select(col("shard_id"), col("id"), col("vec")).localCheckpoint()
      var adj = GraphAnn.buildShardGraph(cur, deg).localCheckpoint()
      var ep = GraphAnn.entryPoints(cur, cents, e).localCheckpoint()
      val buildS = (System.nanoTime() - b0) / 1e9
      // FIXED probe workload (the benchmark contract): stride queries —
      // replica ids are probe-safe (never ≡ 0 mod 25, ScaleGen), so the
      // stride yields the BASE batch at every scale; capped at 40
      val queries = Tables.queryPoints(spark, dir, stride = 25)
        .orderBy(col("qid")).limit(40).localCheckpoint()
      val routes = ShardedSearch.route(queries, cents, t = SparkEntry.Params.t)
        .select(col("qid"), col("qvec"), col("shard_id")).localCheckpoint()
      def recallOf(a: org.apache.spark.sql.DataFrame,
          en: org.apache.spark.sql.DataFrame): Double = {
        val beam = GraphAnn.beamSearch(cur, a, en, routes, k = 10,
          ef = SparkEntry.Params.beamEf, rounds = SparkEntry.Params.beamRounds)
          .select(col("qid"), col("neighbor_id"))
        val scan = ShardedSearch.search(cur, queries, cents, k = 10,
          t = SparkEntry.Params.t).select(col("qid"), col("neighbor_id"))
        beam.intersect(scan).count().toDouble / scan.count()
      }
      def recallNow(): Double = recallOf(adj, ep)
      // the comparison baseline: a from-scratch index over the SAME
      // post-cycle point set — what a maintenance-free deployment would
      // pay a full rebuild for
      def recallRebuilt(): Double = recallOf(
        GraphAnn.buildShardGraph(cur, deg).localCheckpoint(),
        GraphAnn.entryPoints(cur, cents, e).localCheckpoint())
      def orphansNow(): Long =
        GraphAnn.churnHealth(cur, adj).agg(sum(col("n_orphaned")))
          .head().getLong(0)
      val r0 = recallNow()
      System.err.println(f"[churn x$n] build=$buildS%.1f s recall0=$r0%.3f")
      // THE DUPLICATE-CLIQUE FINDING + REMEDY, measured: on a near-dup-
      // heavy corpus (every replica point has 9 jittered siblings at
      // ~0.13 while inter-family distances are ~1.4) each point's exact
      // top-degree list is exactly its own family, the graph degenerates
      // into disjoint near-cliques, and a beam can never leave its entry
      // family — absolute recall collapses no matter how the index is
      // maintained (a from-scratch rebuild measures the same). α-pruning
      // does not help (near-equilateral families defeat the RNG rule:
      // d(kept, c') ≈ d(p, c') for every sibling pair). The remedy is the
      // engine's own composition: DEDUP FIRST — collapse families to
      // representatives with the embedding near-dup pass (q31's SRP
      // bucket join + cosine verify), index the representatives, probe
      // the same workload. Measured beside the raw-index recall so
      // SCALE.md's row is before/after on the same data.
      val dedupRecall: Double = {
        val pairs = graft.operators.Dedup
          .embeddingNearDups(pts, threshold = 0.98)
          .select(col("id_b").as("id")).distinct()
        val keepers = pts.join(pairs, Seq("id"), "left_anti").localCheckpoint()
        val nKeep = keepers.count()
        val centsK = Sharding.fitCentroids(spark, keepers, k = shards,
          iters = SparkEntry.Params.iters).localCheckpoint()
        val curK = Sharding.assignLit(keepers,
          centsK.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)),
          keepVec = true)
          .select(col("shard_id"), col("id"), col("vec")).localCheckpoint()
        val adjK = GraphAnn.buildShardGraph(curK, deg).localCheckpoint()
        val epK = GraphAnn.entryPoints(curK, centsK, e).localCheckpoint()
        val routesK = ShardedSearch.route(queries, centsK, t = SparkEntry.Params.t)
          .select(col("qid"), col("qvec"), col("shard_id")).localCheckpoint()
        val beam = GraphAnn.beamSearch(curK, adjK, epK, routesK, k = 10,
          ef = SparkEntry.Params.beamEf, rounds = SparkEntry.Params.beamRounds)
          .select(col("qid"), col("neighbor_id"))
        val scan = ShardedSearch.search(curK, queries, centsK, k = 10,
          t = SparkEntry.Params.t).select(col("qid"), col("neighbor_id"))
        val rec = beam.intersect(scan).count().toDouble / scan.count()
        System.err.println(f"[churn x$n] dedup-first: ${nKeep} keepers " +
          f"of ${pts.count()} points, recall=$rec%.3f")
        rec
      }
      var rows = Vector(s"""{"cycle":0,"recall":${f"$r0%.4f"},"recall_rebuilt":${f"$r0%.4f"},"wall_s":0.0,"orphans":${orphansNow()}}""")
      for (i <- 1 to cycles) {
        val t0 = System.nanoTime()
        // insert: base geometry under fresh ids (max(id)+1-derived, the
        // q178 discipline), assigned to shards like any arriving batch
        val batch = pts.where(col("id") % 9 === i % 9)
          .select((col("id") + (maxId + 1) * i).as("id"), col("vec"))
        val aB = Sharding.assignLit(batch, centArr, keepVec = true)
          .select(col("shard_id"), col("id"), col("vec")).localCheckpoint()
        val ii = GraphAnn.insertIndex(cur, adj, ep, cents, aB, deg, e)
        cur = ii.points.localCheckpoint()
        adj = ii.adjacency.localCheckpoint()
        ep = ii.entries.localCheckpoint()
        // delete: a slice of the CURRENT ids, old and freshly-inserted
        // alike (the adversarial mix)
        val del = cur.where(pmod(col("id"), lit(11)) === (i * 3) % 11)
          .select(col("id")).localCheckpoint()
        val idx = GraphAnn.deleteIndex(cur, adj, ep, cents, del, deg, e)
        cur = idx.points.localCheckpoint()
        adj = idx.adjacency.localCheckpoint()
        ep = idx.entries.localCheckpoint()
        val wall = (System.nanoTime() - t0) / 1e9
        val rec = recallNow()
        val recR = recallRebuilt()
        val orph = orphansNow()
        System.err.println(
          f"[churn x$n] cycle $i wall=$wall%6.1f s recall=$rec%.3f rebuilt=$recR%.3f orphans=$orph")
        rows :+= s"""{"cycle":$i,"recall":${f"$rec%.4f"},"recall_rebuilt":${f"$recR%.4f"},"wall_s":${f"$wall%.1f"},"orphans":$orph}"""
      }
      val line = s"""{"scale":$n,"shards":$shards,"build_s":${f"$buildS%.1f"},"dedup_first_recall":${f"$dedupRecall%.4f"},"cycles":[${rows.mkString(",")}]}"""
      println(line)
      lines :+= line
      spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = true))
    }
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.write(java.nio.file.Paths.get("target/churn_last.json"),
        lines.mkString("[", ",\n ", "]\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}

object ScaleBench {
  /** The headline set from VERDICT r6 §Next-round #1. */
  val headline: Seq[String] = Seq(
    "q02_knn_exact", "q08_search_routed", "q25_minhash_lsh",
    "q41_kanndi_search", "q100_graph_ann", "q103_graph_pq_probe",
    "q110_dup_spans", "q114_span_dedup", "q133_bloom_join",
    "q145_phrase_search", "q150_phrase_bigram")

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outBase = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "/root/repo/target/scale")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val passes = sys.env.get("SPARK_GRAFT_SCALE_PASSES").map(_.toInt).getOrElse(2)
    val only = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // the filter selects over ALL queries (not just the headline), so any
    // SparkEntry family can be swept at scale; no filter = the headline
    val names = only match {
      case Some(pats) =>
        SparkEntry.queries.keys.toSeq.sorted
          .filter(n => pats.exists(n.contains))
      case None => headline
    }

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed scans report their sortBy order (writeBucketed
      // guarantees the one-file-per-bucket layout that makes the claim
      // sound), so bucket-side SMJ sorts are elided (r12, guide SS2.4)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = // scale -> (memoSecs, name -> min secs)
      scala.collection.mutable.LinkedHashMap
        .empty[Int, (Double, Map[String, Double])]
    for (n <- scales) {
      val dir = if (n == 1) src else s"$outBase/x$n"
      if (n > 1) ScaleGen.generate(spark, src, n, dir)
      // shard COUNT scales with the corpus so shard SIZE stays bounded
      System.setProperty("graft.shards", (8 * n).toString)
      // SRP projections grow ~log2(N) so kNN-graph BUCKET SIZE stays
      // bounded (candidates are Σ bucket²: fixed nProj measured 96.6×
      // wall at 100× — the LSH more-projections-at-scale knob)
      System.setProperty("graft.knnproj",
        (8 + math.ceil(math.log(n) / math.log(2)).toInt).toString)
      // stream state-store parallelism tracks arrival RATE (events per
      // micro-batch ×N on the fixed 30-day span): 2 → 6 → 20 (√N growth,
      // core-capped), keeping per-partition batch volume bounded while
      // per-batch commit overhead never dominates — see
      // SparkEntry.withStreamConf (r11 sizing: per-store commit is a
      // fixed cost, so partitions carry ~3k+ rows each at 1×)
      System.setProperty("graft.streamparts",
        math.min(32L, math.max(2L, math.round(2 * math.sqrt(n.toDouble)))).toString)
      spark.conf.set("spark.sql.shuffle.partitions", math.max(32, n))
      // first-touch warm-up, then the (timed, untimed-in-queries) index
      // builds — memo scaling is itself part of the evidence
      for (t <- Seq("lineitem", "orders", "documents", "embeddings"))
        spark.read.parquet(s"$dir/$t.parquet").count()
      Tables.events(spark, dir).count()
      // SPARK_GRAFT_SCALE_NOMEMO=1 skips the ANN-stack index builds — for
      // sweeps over queries that touch none of them (streaming, dedup,
      // text), the ~30 min of 100× build work is pure waste; queries that
      // DO need a memo still build it lazily inside their first pass
      // (min-of-passes then times the probe, as always)
      val m0 = System.nanoTime()
      if (!sys.env.get("SPARK_GRAFT_SCALE_NOMEMO").contains("1"))
        SparkEntry.prebuildScaleMemos(spark, dir)
      val memoSecs = (System.nanoTime() - m0) / 1e9

      val timings = scala.collection.mutable.LinkedHashMap(
        names.map(_ -> Vector.empty[Double]): _*)
      for (_ <- 1 to passes; name <- names) {
        val fn = SparkEntry.queries(name)
        // streaming-sink queries re-run their full streaming execution
        // every pass (same honesty rule as Bench — min-of-passes must
        // time the operator, not a sink re-read)
        SparkEntry.resetSinkArtifact(name, dir)
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        timings(name) :+= dt
        System.err.println(f"[scale x$n] $name%-22s $dt%8.2f s  ($rows rows)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!SparkEntry.pinnedRddIds.contains(id)) rdd.unpersist(blocking = true)
        }
      }
      val mins = names.map(q => q -> timings(q).min).toMap
      results(n) = (memoSecs, mins)
      val qs = names.map(q => "\"" + q + "\":" + f"${mins(q)}%.3f")
        .mkString("{", ",", "}")
      println(s"""{"scale":$n,"dir":"$dir","memo_build_s":${f"$memoSecs%.1f"},"passes":$passes,"queries":$qs}""")
      System.setProperty("graft.shards", "8")
      System.setProperty("graft.knnproj", "8")
      System.setProperty("graft.streamparts", "2")
    }
    // ratio summary vs the smallest scale
    val base = scales.min
    for (n <- scales if n != base; (bm, bq) = results(base); (nm, nq) = results(n)) {
      val rq = names.map { q =>
        val r = nq(q) / math.max(bq(q), 1e-9)
        "\"" + q + "\":" + f"$r%.1f"
      }.mkString("{", ",", "}")
      println(s"""{"ratio_x$n/x$base":$rq,"memo_ratio":${f"${nm / math.max(bm, 1e-9)}%.1f"}}""")
    }
    spark.stop()
  }
}
