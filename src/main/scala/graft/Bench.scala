package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints two JSON lines for the driver — a compact summary, then the full
  * per-query `{"metric":"total",...}` line LAST (the driver archives a
  * bounded tail of stdout and parses from the end, so the complete map
  * must be the final line).
  *
  * Noise model on this box: multi-minute background storms inflate a
  * contiguous STRETCH of wall-clock; back-to-back repeats of one query sit
  * inside the same storm, so best-of-2-adjacent still reports phantom
  * regressions. Defense: run the FULL suite as P interleaved passes
  * (default 3) and take per-query minima ACROSS passes — a storm has to
  * span the whole run to contaminate a minimum. Per-query max is reported
  * alongside so a storm is visible in the artifact instead of silently
  * shaping it.
  *
  * Timing convention: index-BUILD memos (K-Means fit, PQ codes, postings
  * layouts) are prebuilt before pass 1 — their queries time the PROBE,
  * the per-request cost a serving cluster pays. The sink-backed STREAMING
  * queries ([[SparkEntry.sinkBackedQueries]]) are the opposite case: the
  * streaming run IS the operator, so their RUN memo is dropped before
  * every timed pass and each recorded number is a full streaming
  * execution (ingest -> stateful operators -> sink), never the 0.2 s
  * re-read of a sink built in an earlier pass. The FEED files are a
  * write-once artifact shared by all passes (r9): regenerating the
  * source corpus is harness work a production stream never pays, and
  * leaving it in the pass inflated the streaming scale exponents with a
  * linear coalesce(1)-rewrite term (q152's 7.0x at 100x).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_PASSES (default 3), SPARK_GRAFT_BENCH_ONLY
  * (comma-separated name substrings — run a subset while profiling).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(3)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the NTZ->TIMESTAMP cast in Tables.events is only identity under a
      // UTC session — pin it here like Verify/SparkSpec do, so Bench can't
      // time different instants than the verified path on a non-UTC host
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed scans report their sortBy order (writeBucketed
      // guarantees the one-file-per-bucket layout that makes the claim
      // sound), so bucket-side SMJ sorts are elided (r12, guide SS2.4)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session init (parquet datasource, codegen, JIT) so
    // per-query timings measure the queries, not the first-touch setup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // first touch of the BENCH-SF tables (file listing, footer reads,
    // nanosAsLong conf) otherwise lands on whichever query runs first.
    // events MUST go through Tables.events — the raw read throws on its
    // TIMESTAMP(NANOS) column before the conf is set, silently skipping
    // the warm-up it was supposed to provide
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    for (t <- Seq("lineitem", "orders", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    // pre-build the cross-query memos (K-Means fit, KANNDI rounds, PQ
    // encode, stat tables): index-BUILD cost must never land inside the
    // first timed pass of whichever query happens to touch a memo first —
    // that is how earlier rounds reported phantom 30s queries whenever a
    // storm spanned pass 1
    try SparkEntry.prebuildMemos(spark, sfDir) catch { case _: Throwable => () }

    val queries = SparkEntry.queries.toSeq.filter { case (name, _) =>
      only.forall(_.exists(name.contains))
    }
    val timings = // name -> successful wall times (one slot per pass)
      scala.collection.mutable.LinkedHashMap(
        queries.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    val failedSet = scala.collection.mutable.LinkedHashSet.empty[String]
    for (_ <- 1 to passes; (name, fn) <- queries) {
      // sink-backed streaming queries: drop the fileOnce memo so THIS pass
      // re-runs the streaming execution — the operator being benchmarked —
      // instead of timing a parquet re-read of a sink built in pass 1.
      // (Index-build memos stay pinned: their queries time the probe.)
      SparkEntry.resetSinkArtifact(name, sfDir)
      val t0 = System.nanoTime()
      var ok = true
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          ok = false
          failedSet += name
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // a failed iteration's (fast) wall time must not contribute to the
      // reported minimum — only successful runs are timings of the query
      if (ok) timings(name) :+= dt
      // operators may persist intermediates (stat-table .cache()s AND
      // localCheckpoint blocks — the latter live in the BlockManager, not
      // the catalog cache); drop both so later timings aren't paying
      // accumulated memory pressure. EXCEPT memo-backing checkpoints
      // (SparkEntry.pinnedRddIds): dropping those blocks breaks every
      // later consumer — lineage is truncated at a checkpoint. Blocking
      // unpersist: the async form races the next query's jobs
      // (SPARK_JOB_CANCELLED noise in earlier rounds).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!SparkEntry.pinnedRddIds.contains(id)) rdd.unpersist(blocking = true)
      }
    }
    def fmt(v: Double) = if (v.isNaN) "null" else v.toString
    // stdout carries per-query minima rounded to 3 decimals (ms precision —
    // all a cross-round comparison can use) so the driver-archived line
    // stays as small as possible; target/bench_last.json keeps full
    // precision plus the per-query maxima (the storm-visibility artifact)
    def fmt3(v: Double) =
      if (v.isNaN) "null" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val mins = timings.map { case (n, ts) => n -> (if (ts.isEmpty) Double.NaN else ts.min) }
    val maxs = timings.map { case (n, ts) => n -> (if (ts.isEmpty) Double.NaN else ts.max) }
    val qs = mins.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }.mkString("{", ",", "}")
    val qsFull = mins.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val qmax = maxs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val fl = failedSet.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = mins.values.filterNot(_.isNaN).sum
    // a failed query must be impossible to miss: named in the JSON line AND
    // a nonzero exit code
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"passes":$passes,"sf":"$sfDir"}"""
    // both the driver's tail archive AND sbt's own log can truncate the
    // ~5 KB per-query line — persist the full map to a file so analysis
    // never depends on a log line surviving intact
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_last.json"),
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"queries_max":$qmax,"failed":$fl,"passes":$passes,"sf":"$sfDir"}"""
          .getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // the SCALE.md bench-convention note is GENERATED from this run's
    // numbers (the r8/r9 recurring drift: the hand-written note staled
    // whenever a query landed after the note was last edited) — Bench
    // derives the family split from the same map it just serialized and
    // splices it between SCALE.md's BENCH-NOTE markers, so a post-note
    // commit cannot stale the note without re-running the bench it cites.
    // The repo-doc splice is gated on a CANONICAL run (full suite,
    // default passes, default SF) — a SPARK_GRAFT_BENCH_ONLY profiling
    // subset or a nonstandard SF must never overwrite the published note
    // with non-canonical numbers (ADVICE r10); target/bench_note.md is
    // always written, and SPARK_GRAFT_BENCH_SPLICE=1 forces the splice
    // ... and on the canonical 32-core config: the driver ALSO benches at a
    // lower core count (scaling measurement), and that run must not
    // overwrite the published note with low-parallelism numbers (r11: the
    // driver's local[8] run spliced 8-core numbers into SCALE.md)
    val canonicalRun = sys.env.get("SPARK_GRAFT_BENCH_SPLICE") match {
      case Some(v) => v == "1" // explicit override wins either way
      case None => only.isEmpty && passes == 3 &&
        sfDir == "/root/testdata/sf0.1" && cpus == "32"
    }
    try {
      val ok = mins.filterNot(_._2.isNaN)
      val streaming = ok.filter { case (n, _) => SparkEntry.sinkBackedQueries.contains(n) }
      val batch = ok.filter { case (n, _) => !SparkEntry.sinkBackedQueries.contains(n) }
      def f1(x: Double) = f"$x%.1f"
      val top5 = ok.toSeq.sortBy(-_._2).take(5)
        .map { case (n, v) => s"$n ${f1(v)} s" }.mkString(", ")
      val note =
        s"""<!-- GENERATED by graft.Bench from the run that wrote target/bench_last.json — do not edit by hand -->
           |Final-bench artifact (`target/bench_last.json`): **${f1(total)} s /
           |${ok.size} queries** (per-query min of $passes interleaved passes at
           |local[$cpus], `$sfDir`${if (failedSet.nonEmpty) s"; FAILED: ${failedSet.mkString(",")}" else ""}).
           |The ${streaming.size} sink-backed streaming queries — each timed as a
           |full multi-batch streaming execution (ingest → stateful operators →
           |sink) per the r9 feed convention — total ${f1(streaming.values.sum)} s;
           |the other ${batch.size} batch queries total ${f1(batch.values.sum)} s.
           |Slowest five: $top5.""".stripMargin
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_note.md"),
        note.getBytes("UTF-8"))
      val scalePath = java.nio.file.Paths.get("SCALE.md")
      if (canonicalRun && java.nio.file.Files.exists(scalePath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(scalePath), "UTF-8")
        val b = "<!-- BENCH-NOTE:BEGIN -->"
        val e = "<!-- BENCH-NOTE:END -->"
        val i = txt.indexOf(b); val j = txt.indexOf(e)
        if (i >= 0 && j > i)
          java.nio.file.Files.write(scalePath,
            (txt.substring(0, i + b.length) + "\n" + note + "\n" + txt.substring(j))
              .getBytes("UTF-8"))
        else
          // a silent marker miss is exactly the stale-note drift this
          // mechanism exists to prevent — make it visible (ADVICE r10)
          System.err.println("[bench] WARNING: SCALE.md BENCH-NOTE markers " +
            "missing/reordered — generated note NOT spliced (see target/bench_note.md)")
      }
    } catch {
      case t: Throwable =>
        System.err.println(s"[bench] WARNING: bench-note generation/splice " +
          s"failed (${t.getClass.getName}: ${String.valueOf(t.getMessage)
            .linesIterator.take(1).mkString}) — SCALE.md note may be stale")
    }
    // the driver archives only a ~2 KB TAIL of this process's output. Print
    // a compact self-contained summary (total + slowest 5 + failures) FIRST,
    // then the full per-query line LAST (VERDICT r11 contract repair: the
    // driver parses the last line, and r10/r11 both lost their per-query
    // comparison because the full line printed before the summary and was
    // truncated mid-map by the tail archive). The full line is kept as
    // small as honesty allows — 3-decimal minima, no per-query maxima — so
    // as much of it as possible survives any tail cut.
    val slowest = mins.toSeq.filterNot(_._2.isNaN).sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + fmt3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"summary","total":$total,"unit":"sec","n_queries":${mins.size},"slowest":$slowest,"failed":$fl,"passes":$passes,"sf":"$sfDir"}""")
    println(fullLine)
    spark.stop()
    if (failedSet.nonEmpty) sys.exit(1)
  }
}
