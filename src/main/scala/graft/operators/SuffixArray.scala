package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.chaining._

/** Distributed SUFFIX ARRAY construction by prefix doubling — the
  * infrastructure behind exact-substring dedup at corpus scale (Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models Better",
  * builds exactly this over the concatenated corpus; q110's winnowed
  * Karp–Rabin anchors are the sampled approximation, this is the exact
  * tool). The corpus string is the concatenation of `text || chr(1)`
  * in id order; the result ranks every suffix of that string.
  *
  * Algorithm (Manber–Myers prefix doubling): rank suffixes by their
  * first character, then repeatedly re-rank by the pair
  * (rank of pos, rank of pos+k) for k = 1, 2, 4, … — after round k every
  * rank reflects the suffix's first 2k characters, and once all ranks
  * are distinct they equal the final suffix-array ranks. ceil(log2 n)
  * rounds, each round two relational primitives:
  *
  *  - the k-shift is a positional EQUI-JOIN (pos ↔ pos+k), never an
  *    unpartitioned window;
  *  - the pair re-rank is a GROUP-START rank (Larsson–Sadakane: label =
  *    rows in strictly smaller groups) computed with the repo's
  *    range-partition discipline — equal keys are never split across
  *    partitions, so partition-local sweeps compose exactly. Group-start
  *    labels freeze the moment a group goes singleton, so CONVERGED
  *    suffixes drop out of every later round: round m only re-ranks the
  *    rows still in non-singleton groups, and from round 2 on placement
  *    is a deterministic bucket of the label (no range-sampling pass, no
  *    driver offset merge — see groupStartRank). The final labels equal
  *    the dense build's ranks exactly. No single-partition sort anywhere.
  *
  * Each round materializes via localCheckpoint: the next round's passes
  * would otherwise re-execute the whole doubling chain.
  *
  * Scale: rounds = ceil(log2 n) (~47 at 100 T chars); per round one
  * positional equi-join against the n-row labeling (a broadcast of the
  * active side once it fits — the labeling then streams map-side) + one
  * shuffle of the ACTIVE rows only, shrinking geometrically for typical
  * text. The driver holds one long per partition for the first refining
  * round only (early-exit: a round with no non-singleton group left is
  * final — extra rounds past distinctness are no-ops, which is what lets
  * a fixed-round oracle replay an early-exiting build). Positions are
  * int64; ranks stay < n so nothing overflows. */
object SuffixArray {

  /** Truly release a `localCheckpoint`ed frame: `Dataset.unpersist` only
    * talks to the CacheManager, which a checkpoint never registers with —
    * the persisted rows live on the checkpoint RDD behind the plan's
    * LogicalRDD leaf, and stay pinned until GC unless released there.
    * (Without this, "unpersist the previous round" silently retained the
    * full O(n log n) history and the O(n)-pinned claim was false.)
    * Walks the whole plan, not just a root leaf: the group-start build's
    * frames are UNIONs of per-round checkpoints, so every LogicalRDD leaf
    * under the frame must be released. */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Active rows above this count take the shift lookup as a shuffled
    * join; at or below it the active side broadcasts and the n-row label
    * frame streams map-side (§3.1) — no shuffle of the big side. */
  private val BroadcastActives = 500000L

  /** ENDGAME threshold (build mode): once the active set fits here, the
    * remaining doubling rounds are resolved on the DRIVER — every label
    * a future round can probe sits at pos + k·2^j for a CURRENTLY active
    * pos (probes only ever originate at active rows), so one broadcast
    * semi-join against the current labeling fetches all ≤ |active|·log₂n
    * of them, and the remaining rounds are a local loop over ≤ 128k rows
    * instead of ~log₂(n/k) more Spark rounds that each pay a fixed
    * ~0.5 s of job/planning floor regardless of row count (measured:
    * rounds with 88 active rows cost the same wall as rounds with 5k).
    * Driver memory is bounded by the threshold (≤ 128k·log₂n longs ≈ 100 MB worst-case),
    * independent of corpus size — the knob is a driver-RAM constant,
    * not a data-scaled one. */
  private val EndgameRows = 131072L

  /** GROUP-START rank of `df`'s rows under the (r, r2) sort key — the
    * Larsson–Sadakane labeling: rank of a key group = number of ROWS in
    * strictly smaller groups, not the dense group index. Group-start
    * ranks are what let converged suffixes drop out of later doubling
    * rounds: a singleton group's rank equals its suffix's final position
    * in the sorted order and never changes again (refining other groups
    * only renumbers rows INSIDE those groups), whereas a dense rank
    * shifts on every split anywhere to its left. Per round the labels
    * stay injective per group and order-consistent with the final suffix
    * order, and once every group is a singleton the group-start rank IS
    * the dense rank — so the final SA is identical to the dense build's.
    *
    * Two modes. `global = true` (the first refining round, whose incoming
    * r is the raw code point, not a row count): rank = rows before the
    * key globally — sampling-based range partition (the code-point space
    * is skewed), one count row per partition driver-merged into exclusive
    * prefix offsets, then a partition-local sweep; the denseRank
    * discipline, emitting group starts. `global = false` (later rounds:
    * incoming r is itself a group-start rank in [0, n) and every row of a
    * non-singleton r group is still present): rank = r + rows before the
    * key INSIDE its r group — which needs no cross-partition coordination
    * at all, because an r group never splits when rows are placed by a
    * DETERMINISTIC bucket of r (equal r ⇒ equal bucket). That kills both
    * per-round driver jobs: no range-sampling pass, no offset collect —
    * one shuffle + sweep job per round, sized by `rowsHint` (the caller's
    * active-row count) rather than a fixed partition constant (§2).
    *
    * Returns the materialized (localCheckpoint) frame (pos, r,
    * single = the row's group is a singleton, i.e. converged) and the
    * count of rows in non-singleton groups = the next round's active set
    * size. In within mode that count rides an add-only accumulator on the
    * checkpoint job — safe for the termination test (`== 0`): retries can
    * only inflate a nonzero count, and a true zero has nothing to add. */
  private def groupStartRank(df: DataFrame, global: Boolean, n: Long,
      rowsHint: Long): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    if (global) {
      val keyed = df.select(col("pos"), col("r"), col("r2"))
        .repartitionByRange(col("r"), col("r2"))
        .sortWithinPartitions(col("r"), col("r2"))
        .rdd
      val stats = keyed.mapPartitionsWithIndex { (pid, it) =>
        var nRows = 0L; var lastR = 0L; var lastR2 = 0L
        var runLen = 0L; var singles = 0L
        it.foreach { row =>
          val r = row.getLong(1); val r2 = row.getLong(2)
          if (nRows > 0L && r == lastR && r2 == lastR2) runLen += 1
          else { if (runLen == 1L) singles += 1; runLen = 1L }
          nRows += 1; lastR = r; lastR2 = r2
        }
        if (runLen == 1L) singles += 1
        Iterator.single((pid, nRows, singles))
      }.collect().sortBy(_._1)
      val bases = new Array[Long](stats.length)
      var acc = 0L
      stats.foreach { case (pid, rows, _) => bases(pid) = acc; acc += rows }
      val nActive = stats.map { case (_, rows, s) => rows - s }.sum
      val bc = spark.sparkContext.broadcast(bases)
      val ranked = keyed.mapPartitionsWithIndex { (pid, it0) =>
        val it = it0.buffered
        var cnt = bc.value(pid)
        var haveKey = false; var keyR = 0L; var keyR2 = 0L; var runRank = 0L
        new Iterator[(Long, Long, Boolean)] {
          def hasNext: Boolean = it.hasNext
          def next(): (Long, Long, Boolean) = {
            val row = it.next()
            val pos = row.getLong(0); val r = row.getLong(1); val r2 = row.getLong(2)
            val newRun = !haveKey || r != keyR || r2 != keyR2
            if (newRun) { runRank = cnt; haveKey = true; keyR = r; keyR2 = r2 }
            cnt += 1
            val single = newRun && (!it.hasNext ||
              { val nx = it.head; nx.getLong(1) != r || nx.getLong(2) != r2 })
            (pos, runRank, single)
          }
        }
      }.toDF("pos", "r", "single").pipe(Ckpt.cut)
      (ranked, nActive)
    } else {
      val acc = spark.sparkContext.longAccumulator("sa_next_active")
      // shuffle width scales with the shrinking active set (target ~16k
      // rows/task, capped at the session's shuffle parallelism) instead
      // of paying a fixed task count for a handful of late-round rows;
      // ~64 buckets per partition keep the pid hash spread even (§2.5)
      val parts = math.max(1L, math.min(
        spark.conf.get("spark.sql.shuffle.partitions").toLong,
        rowsHint / 16384L + 1L)).toInt
      val buckets = parts.toLong * 64L
      val keyed = df.select(col("pos"), col("r"), col("r2"))
        .withColumn("pid", (col("r") * buckets / n).cast("long"))
        .repartition(parts, col("pid"))
        .sortWithinPartitions(col("r"), col("r2"))
        .rdd
      val ranked = keyed.mapPartitionsWithIndex { (_, it0) =>
        val it = it0.buffered
        var curR = 0L; var haveR = false; var cnt = 0L
        var haveKey = false; var keyR = 0L; var keyR2 = 0L; var runRank = 0L
        new Iterator[(Long, Long, Boolean)] {
          def hasNext: Boolean = it.hasNext
          def next(): (Long, Long, Boolean) = {
            val row = it.next()
            val pos = row.getLong(0); val r = row.getLong(1); val r2 = row.getLong(2)
            if (!haveR || r != curR) { curR = r; haveR = true; cnt = 0L }
            val newRun = !haveKey || r != keyR || r2 != keyR2
            if (newRun) { runRank = r + cnt; haveKey = true; keyR = r; keyR2 = r2 }
            cnt += 1
            val single = newRun && (!it.hasNext ||
              { val nx = it.head; nx.getLong(1) != r || nx.getLong(2) != r2 })
            if (!single) acc.add(1L)
            (pos, runRank, single)
          }
        }
      }.toDF("pos", "r", "single").pipe(Ckpt.cut)
      (ranked, acc.value)
    }
  }

  /** [[buildFull]]'s result: `sa` = final (pos, rank); `history(k)` =
    * (pos, r) where r is the rank of the suffix TRUNCATED to its first
    * 2^k characters (history(0) = raw code points — equality there is
    * exactly character equality, which is all the LCP descent compares);
    * `n` = corpus length in characters. In-memory history frames are
    * unions over the per-round checkpoints (frozen parts + that round's
    * ranking) and stay pinned until [[SaIndex.unpersist]], which walks
    * every union leaf; sink-backed frames are parquet reads (nothing
    * pinned) carrying an extra `single` column consumers ignore. */
  final case class SaIndex(sa: DataFrame, history: Seq[DataFrame], n: Long) {
    def unpersist(): Unit = history.foreach(SuffixArray.dropCheckpoint)
  }

  /** Suffix-array ranks of the corpus string concat(text || chr(1)
    * ORDER BY id). Returns (pos, rank), one row per character position,
    * rank ∈ [0, n) = the suffix's position in the sorted suffix order.
    * `docs` must have (id, text). */
  def build(docs: DataFrame): DataFrame =
    core(docs, keepHistory = false, sink = None).sa

  /** [[build]], keeping the per-round rank tables — the index the LCP
    * descent ([[lcpAdjacent]]) consumes. The prefix-doubling history IS
    * the distributed answer to Kasai's (inherently sequential) LCP
    * construction: lcp(i, j) is recovered in ceil(log2 n) rank-table
    * equality probes, so keeping the O(n log n) rows the build already
    * materialized buys exact LCPs with no sequential pass.
    *
    * With no `sink` the history stays pinned in block-manager storage
    * (fine at test scale; [[SaIndex.unpersist]] releases it). Passing
    * `sink = Some(base)` SPILLS each round to `base/h<k>` parquet the
    * moment it lands and unpersists its checkpoint — the build then pins
    * O(n) rows at any instant and the returned index is fully
    * parquet-backed (nothing pinned at all), which is both the
    * persistent-artifact path (saIndexMemo) and the only sane retention
    * at corpus scale: 100 T chars × ~47 rounds must live on shared
    * storage, not in executor memory. [[build]] is the third retention
    * mode — no history: each round pins only its own ranking, and the
    * union of frozen rows (Σ|active_k| ≈ O(n) for typical text) is the
    * final SA. */
  def buildFull(docs: DataFrame, sink: Option[String] = None): SaIndex =
    core(docs, keepHistory = true, sink)

  /** The [[EndgameRows]] local loop: exactly the distributed rounds'
    * semantics — key by (label, label at pos+k), sort, GROUP-START
    * relabel within each label group, freeze singletons, double k — over
    * the collected active rows. `snap` holds the current label of every
    * position a probe can touch; positions that were active at
    * collection evolve in `cur` and shadow it (a frozen-before position's
    * snapshot label is final; a collected-active one freezes here with
    * its final label and keeps answering probes). Returns every input
    * row's final (pos, rank). */
  private def endgameResolve(act: Array[(Long, Long)],
      snap: java.util.HashMap[Long, Long], n: Long,
      k0: Long): Array[(Long, Long)] = {
    val cur = new java.util.HashMap[Long, Long](act.length * 2)
    act.foreach { case (p, r) => cur.put(p, r) }
    var live = act
    var k = k0
    while (live.nonEmpty && k < n) {
      val sorted = live.map { case (p, r) =>
        val q = p + k
        val r2 =
          if (q >= n) -1L
          else if (cur.containsKey(q)) cur.get(q)
          else snap.get(q) // every q < n is in the full labeling
        (p, r, r2)
      }.sortBy(t => (t._2, t._3))
      val stillLive = Array.newBuilder[(Long, Long)]
      var i = 0
      var curR = 0L; var haveR = false; var cnt = 0L
      while (i < sorted.length) {
        val r = sorted(i)._2; val r2 = sorted(i)._3
        if (!haveR || r != curR) { curR = r; haveR = true; cnt = 0L }
        var j = i + 1
        while (j < sorted.length && sorted(j)._2 == r && sorted(j)._3 == r2)
          j += 1
        val label = r + cnt
        cnt += (j - i)
        var m = i
        while (m < j) {
          cur.put(sorted(m)._1, label)
          if (j - i > 1) stillLive += ((sorted(m)._1, label))
          m += 1
        }
        i = j
      }
      live = stillLive.result()
      k *= 2
    }
    act.map { case (p, _) => (p, cur.get(p)) }
  }

  /** Packed-init width cap (build mode): at 7 bits/char a 63-bit long
    * holds 9 ASCII characters, so the doubling starts at k = 9 instead of
    * k = 1 — the first ~log2(9) full-corpus-size rounds (the most
    * expensive ones: nothing has converged yet) never run. */
  private val PackCharsMax = 9L

  private def core(docs: DataFrame, keepHistory: Boolean,
      sink: Option[String]): SaIndex = {
    require(sink.isEmpty || keepHistory, "a sink implies keepHistory")
    val spark = docs.sparkSession
    // per-doc start offsets: the packCounts two-phase prefix sum over
    // (length + 1 terminator) in id order
    val offs = Packing.packCounts(
        docs.select(col("id"), (length(col("text")) + 1).as("n")),
        blockTokens = Long.MaxValue)
      .select(col("id"), col("start_off"))
    // PACKED INITIAL LABELS (build mode, r12): rank-by-first-character
    // needs ceil(log2 m) doubling rounds — each a full-corpus shuffle +
    // checkpoint, nothing converged yet — before labels reflect m
    // characters. When the corpus is pure ASCII (byte = character, O(1)
    // indexing) and free of chr(0), the init pass instead emits the
    // first mPack characters packed big-endian at 7 bits each into one
    // long (PackChars): packed-value ORDER is truncated-suffix order and
    // packed EQUALITY is truncated-suffix equality (past-end pads 0,
    // strictly below every real character incl. the chr(1) terminator),
    // which is precisely the init contract — so the doubling starts at
    // k = mPack and the first refinement already reflects 2·mPack
    // characters. The final SA is identical to the unpacked build's (the
    // labels are order-consistent at every k either way; SuffixArraySpec
    // pins packed ≡ unpacked ≡ brute force). mPack is clamped to
    // min-doc-length + 2 so ONE next doc always covers the cross-
    // terminator tail (no chained lookahead), and to n - 1 so at least
    // one refinement round turns packed values into group-start ranks.
    // HISTORY mode never packs: history(k) must be the rank of the
    // first 2^k characters exactly (the LCP descent's step contract).
    val mPack: Int = if (keepHistory) 1 else {
      val st = docs.agg(
        sum(length(col("text")) + 1),
        min(length(col("text"))),
        max(when(octet_length(col("text")) =!= length(col("text")), 1)
          .otherwise(0)),
        max(when(instr(col("text"), "\u0000") > 0, 1).otherwise(0))).head
      if (st.isNullAt(0) || st.getInt(2) == 1 || st.getInt(3) == 1) 1
      else Seq(PackCharsMax, st.getInt(1).toLong + 2L, st.getLong(0) - 1L)
        .min.max(1L).toInt
    }
    val init =
      if (mPack <= 1)
        // one row per character; initial rank = code point (terminator =
        // 1), correct because single-char ranks only need to be
        // ORDER-consistent
        docs.join(offs, "id")
          .select(col("start_off"),
            posexplode(split(concat(col("text"), lit("\u0001")), "")))
          .select((col("start_off") + col("pos")).as("pos"),
            ascii(col("col")).cast("long").as("r"))
          .pipe(Ckpt.cut)
      else {
        val d = docs.join(offs, "id")
          .select(col("text"), length(col("text")).as("tlen"), col("start_off"))
        // the mPack-1 characters FOLLOWING a doc's terminator are the
        // head of the NEXT doc's text+terminator: a positional equi-join
        // on the next doc's start offset (= start_off + tlen + 1) — the
        // build's own join discipline, no window over the doc order. The
        // mPack clamp guarantees one next doc covers the whole tail; the
        // LAST doc has no successor — there the corpus truly ends and
        // PackChars pads 0.
        val tails = d.select(col("start_off").as("nstart"),
          substring(concat(col("text"), lit("\u0001")), 1, mPack - 1).as("tail"))
        d.join(tails, col("nstart") === col("start_off") + col("tlen") + 1,
            "left")
          .select(col("start_off"), col("tlen"),
            concat(col("text"), lit("\u0001"),
              coalesce(col("tail"), lit(""))).as("ext"))
          .select(col("start_off"), col("ext"),
            posexplode(sequence(lit(0), col("tlen"))).as(Seq("off", "ignored")))
          .select((col("start_off") + col("off")).as("pos"),
            graft.functions.TextExpressions.packChars(
              col("ext"), col("off"), mPack, bits = 7).as("r"))
          .pipe(Ckpt.cut)
      }
    val n = init.count()
    if (sys.props.contains("graft.saprof"))
      println(s"[saprof] init n=$n packed_m=$mPack")
    // spill round k to the sink and hand back the parquet read — the
    // checkpoint behind it can then drop without losing the round. The
    // sink history carries the `single` flag (h0: all false) so each
    // round can read yesterday's frozen set back off parquet instead of
    // pinning it; history consumers only ever select (pos, r).
    def emit(k: Int, df: DataFrame): DataFrame = sink match {
      case Some(base) =>
        df.write.mode("overwrite").parquet(s"$base/h$k")
        spark.read.parquet(s"$base/h$k")
      case None => df
    }
    var history =
      if (keepHistory)
        Vector(emit(0, if (sink.isDefined)
          init.withColumn("single", lit(false)) else init))
      else Vector.empty[DataFrame]
    // Larsson–Sadakane bookkeeping (groupStartRank scaladoc): rows whose
    // group went singleton carry FINAL labels and leave the working set.
    //  - active: rows still in non-singleton groups (the only rows later
    //    rounds re-rank);
    //  - frozenParts (no-sink modes): lazy filters over the pinned round
    //    checkpoints whose union with `active` is the complete current
    //    labeling — the shift side and, at the end, the SA itself;
    //  - sink mode reads the complete labeling back from the previous
    //    round's parquet instead, so only the current round stays pinned
    //    (the O(n)-at-any-instant retention claim).
    var frozenParts = Vector.empty[DataFrame]
    var active: DataFrame = init
    var activeRows = n
    var cur: DataFrame = init
    var round = 0
    var k = mPack.toLong
    var done = n == 0
    while (!done && k < n) {
      // ENDGAME (build mode, past the global round): resolve every
      // remaining round on the driver — one broadcast semi-join fetches
      // all labels future probes can touch, then [[endgameResolve]]
      // replays the rounds locally. History mode stays distributed (it
      // must emit a frame per round).
      if (!keepHistory && round >= 1 && activeRows <= EndgameRows) {
        import spark.implicits._
        val labelsNow = (frozenParts :+ active).reduce(_ unionByName _)
        val act = active.select(col("pos"), col("r")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val ks = Iterator.iterate(k)(_ * 2).takeWhile(_ < n).toSeq
        val pset = new java.util.HashSet[Long]
        act.foreach { case (p, _) =>
          ks.foreach { kk => val q = p + kk; if (q < n) pset.add(q) } }
        import scala.jdk.CollectionConverters._
        val probeDf = pset.asScala.toSeq.toDF("pos")
        val snapRows = labelsNow.join(broadcast(probeDf), Seq("pos"))
          .select(col("pos"), col("r")).collect()
        val snap = new java.util.HashMap[Long, Long](snapRows.length * 2)
        snapRows.foreach(r => snap.put(r.getLong(0), r.getLong(1)))
        val t0e = System.nanoTime()
        val fin = endgameResolve(act, snap, n, k)
        if (sys.props.contains("graft.saprof"))
          println(f"[saprof] endgame at round=$round k=$k active=$activeRows " +
            f"probes=${snapRows.length} wall=${(System.nanoTime() - t0e) / 1e9}%6.3f s")
        active = spark.createDataset(fin.toIndexedSeq).toDF("pos", "r")
        activeRows = 0
        done = true
      } else {
      val labels =
        if (sink.isDefined) history.last.select(col("pos"), col("r"))
        else (frozenParts :+ active).reduce(_ unionByName _)
      val shifted = labels.select((col("pos") - k).as("pos"), col("r").as("r2"))
      // every active pos < n-k has a label at pos+k; the rest are past
      // the end (r2 = -1 ranks smallest). Writing the null case as its
      // own branch lets small-active rounds run the lookup as a
      // BROADCAST of the active side — the n-row label frame streams
      // map-side, nothing shuffles (§3.1); large rounds keep the
      // shuffled equi-join.
      val inRange = active.where(col("pos") < n - k)
      val withIn =
        if (activeRows <= BroadcastActives)
          shifted.join(broadcast(inRange), Seq("pos"))
        else inRange.join(shifted, Seq("pos"))
      val paired = withIn.select(col("pos"), col("r"), col("r2"))
        .unionByName(active.where(col("pos") >= n - k)
          .select(col("pos"), col("r"), lit(-1L).as("r2")))
      val t0 = System.nanoTime()
      val (next, nActive) =
        groupStartRank(paired, global = round == 0, n, activeRows)
      round += 1
      // -Dgraft.saprof=1: per-round wall + active-set size (guide §1 —
      // the measurement behind the Larsson sizing decisions)
      if (sys.props.contains("graft.saprof"))
        println(f"[saprof] round=$round%2d k=$k%8d active_in=$activeRows%8d " +
          f"active_out=$nActive%8d wall=${(System.nanoTime() - t0) / 1e9}%6.3f s")
      // coalesce (narrow, no shuffle) each filter to a row-proportional
      // task count: the labels union accumulates one branch per round,
      // and without this every later round schedules the PARENT
      // checkpoint's full partition count per branch — measured ~100
      // near-empty tasks per sub-5k-row round, the late-round wall floor
      def sized(df: DataFrame, rows: Long) = df.coalesce(math.max(1L,
        math.min(spark.conf.get("spark.sql.shuffle.partitions").toLong,
          rows / 65536L + 1L)).toInt)
      val newFrozen = sized(
        next.where(col("single")).select(col("pos"), col("r")),
        activeRows - nActive)
      val newActive = sized(
        next.where(!col("single")).select(col("pos"), col("r")), nActive)
      if (keepHistory) {
        // the complete labeling after this round: frozen-so-far ∪ this
        // round's ranking (frozen labels are final — see groupStartRank)
        val fullNow =
          if (sink.isDefined)
            history.last.where(col("single"))
              .select(col("pos"), col("r"), col("single"))
              .unionByName(next.select(col("pos"), col("r"), col("single")))
          else (frozenParts :+ newFrozen :+ newActive).reduce(_ unionByName _)
        history :+= emit(round, fullNow)
      }
      if (sink.isDefined) {
        // the emitted parquet now carries everything `cur` backed
        dropCheckpoint(cur)
        cur = next
      } else {
        // no-sink: each round's checkpoint stays pinned — its frozen
        // filter is referenced until the end (total pinned = Σ|active_k|,
        // the classic Larsson working-set bound). The init frame is only
        // dead in BUILD mode (in-memory history(0) is init itself).
        if (!keepHistory && round == 1) dropCheckpoint(cur)
        cur = next
        frozenParts :+= newFrozen
      }
      active = newActive
      activeRows = nActive
      done = nActive == 0
      k *= 2
      }
    }
    if (sink.isDefined) {
      // fully parquet-backed index: the final round is already spilled as
      // the last history entry, so nothing stays pinned
      val last = history.last
      dropCheckpoint(cur)
      SaIndex(last.select(col("pos"), col("r").as("rank")), history, n)
    } else {
      // at termination every row is frozen (or the loop never ran and
      // everything is still `active`): the union IS the final SA
      val sa = (frozenParts :+ active).reduce(_ unionByName _)
      SaIndex(sa.select(col("pos"), col("r").as("rank")), history, n)
    }
  }

  /** LCP between RANK-ADJACENT suffixes: one row per rank t ∈ [1, n),
    * (pos_a = suffix at rank t, pos_b = suffix at rank t-1, lcp). The
    * duplicated-substring primitive: every duplicated substring of length
    * L has some adjacent pair with lcp ≥ L (suffixes ranked between two
    * occurrences of it all share the occurrences' common prefix).
    *
    * Descent over the doubling history, highest round first: maintain
    * (pos_a, pos_b, l); at round k, if history(k)'s ranks at pos_a + l
    * and pos_b + l are EQUAL then the truncated suffixes there agree on
    * 2^k more characters — advance l += 2^k. Equal round-k ranks imply
    * both positions have ≥ 2^k characters remaining (truncated suffixes
    * of different lengths can only relate as strict prefix, and the
    * doubling's past-end = -1 convention ranks the shorter strictly
    * first, so they never tie), so the advance never overshoots; a
    * missing rank row (pos + l = n, suffix exhausted) or unequal ranks
    * advance nothing and the next round halves the probe. After round 0
    * (character equality) l is exactly the LCP. Each round is two
    * positional equi-joins over n-1 rows — the build's own shuffle
    * discipline, no windows, nothing driver-sized — and the top round is
    * a guaranteed no-op (final ranks are distinct), kept for the uniform
    * argument. The fixed-round oracle replay composes for the same
    * reason as the build's: extra all-distinct top rounds never advance. */
  def lcpAdjacent(idx: SaIndex): DataFrame =
    lcpDescent(idx, adjacentPairs(idx))

  /** (rank, pos_a = suffix at rank t, pos_b = suffix at rank t-1) for
    * every rank t ∈ [1, n) — one equi-join of the SA against itself. */
  def adjacentPairs(idx: SaIndex): DataFrame = {
    val prevRank = idx.sa.select((col("rank") + 1).as("rank"),
      col("pos").as("pos_b"))
    idx.sa
      .join(prevRank, Seq("rank"))
      .select(col("rank"), col("pos").as("pos_a"), col("pos_b"))
  }

  /** The rank-history descent over an arbitrary (rank, pos_a, pos_b) pair
    * set → (rank, pos_a, pos_b, lcp). When the pair set is small (it is,
    * on the duplicateSpans fast path — only window-saturated pairs reach
    * here) each round is a broadcast-INNER lookup: the pairs broadcast as
    * the hash side, the history table is streamed map-side, nothing
    * shuffles. Inner is safe because the history is first completed with
    * a sentinel row (pos = n, rank -2) for the one probe position outside
    * it — and the sentinel can never cause a false advance, since both
    * sides reaching it would need pos_a + l = pos_b + l = n, impossible
    * for distinct positions. Above the threshold the descent falls back
    * to the shuffled left-join form that handles adversarially
    * duplicate-heavy corpora. */
  def lcpDescent(idx: SaIndex, pairSet: DataFrame,
      broadcastThreshold: Long = 500000L,
      maxNeededLcp: Option[Long] = None): DataFrame = {
    var pairs = pairSet
      .select(col("rank"), col("pos_a"), col("pos_b"), lit(0L).as("l"))
      .pipe(Ckpt.cut)
    val nPairs = pairs.count()
    // empty pair set: the descent is ~log2(n) sequential checkpoint
    // rounds that would each produce zero rows — return the (empty)
    // frame directly instead of paying them (r11)
    if (nPairs == 0L)
      return pairs.select(col("rank"), col("pos_a"), col("pos_b"),
        col("l").as("lcp"))
    val small = nPairs <= broadcastThreshold
    // round skip under a caller-declared need cap (r11): restricted to
    // the rounds {k : 2^k ≤ cap}, the greedy descent returns
    // min(lcp, 2^(K+1)-1) with K = ⌊log2 cap⌋ — and 2^(K+1)-1 ≥ cap, so
    // a consumer that only uses min(lcp, cap) (duplicateSpansFrom clips
    // every span at the doc-terminator distances) sees a value
    // indistinguishable from the full descent's, while the top
    // ~log2(n/cap) rounds never run. With no cap every history round
    // runs, exactly as before.
    val rounds = idx.history.indices.reverse
      .filter(k => maxNeededLcp.forall(cap => (1L << k) <= cap))
    for (k <- rounds) {
      val step = 1L << k
      val sent = idx.sa.sparkSession.range(1)
        .select(lit(idx.n).as("pos"), lit(-2L).as("r"))
      // the sink-backed history carries an extra `single` flag — the
      // descent only ever reads (pos, r)
      val hk = idx.history(k).select(col("pos"), col("r")).unionByName(sent)
      val ha = hk.select(col("pos").as("pa"), col("r").as("ra"))
      val hb = hk.select(col("pos").as("pb"), col("r").as("rb"))
      val next = (if (small)
          hb.join(
            broadcast(ha.join(broadcast(pairs),
              col("pa") === col("pos_a") + col("l"))),
            col("pb") === col("pos_b") + col("l"))
        else
          pairs
            .join(ha, col("pa") === col("pos_a") + col("l"), "left")
            .join(hb, col("pb") === col("pos_b") + col("l"), "left"))
        .select(col("rank"), col("pos_a"), col("pos_b"),
          (col("l") + when(col("ra").isNotNull && col("ra") === col("rb") &&
            col("ra") =!= lit(-2L), lit(step)).otherwise(lit(0L))).as("l"))
        .pipe(Ckpt.cut)
      dropCheckpoint(pairs)
      pairs = next
    }
    pairs.select(col("rank"), col("pos_a"), col("pos_b"), col("l").as("lcp"))
  }

  /** EXACT duplicated-substring spans (the Lee et al. deliverable the
    * suffix array exists for; Dedup.dupSpans' winnowed Karp–Rabin anchors
    * are the sampled approximation this makes auditable): rank-adjacent
    * suffix pairs whose common prefix, CLIPPED at each side's document
    * terminator, is at least `minLen` characters — a verbatim run of
    * ≥ minLen characters appearing at both (doc_a, off_a) and
    * (doc_b, off_b). Within-doc repeats qualify (doc_a = doc_b at
    * different offsets); the terminator clip keeps a span from leaking
    * across document boundaries through the shared chr(1) separator.
    *
    * One row per surviving adjacent pair, keyed by the rank-t side:
    * (doc_a, off_a) is unique across rows. Plan shape: buildFull +
    * lcpAdjacent (log-round equi-joins), two positional equi-joins
    * against the n-row (pos → doc, off, chars-to-terminator) frame, one
    * filter — everything stays one-row-per-character, never pairwise. */
  def duplicateSpans(docs: DataFrame, minLen: Int = 11): DataFrame = {
    val idx = buildFull(docs)
    val out = duplicateSpansFrom(idx, docs, minLen)
    idx.unpersist()
    out
  }

  /** The fast path's probe width: pairs whose within-doc LCP verdict fits
    * W characters skip the deep path entirely. */
  private val W = 64

  /** Deep-path guards: window-saturated pairs resolve via the full-clip-
    * width doc-tail probe only while the pair set is the cheap side — at
    * most this many rows AND at most [[DeepWindowBytes]] of summed clip
    * width (the probe broadcasts the pair set with its win_a windows
    * attached, so the summed clip width IS its payload bound). Past
    * either, the capped rank descent runs instead: its rounds carry
    * ranks, never text, so an adversarially duplicate-heavy corpus costs
    * O((n + pairs)·log cap), not O(pairs × doc-tail). */
  private val DeepWindowPairs = 500000L
  private val DeepWindowBytes = 64L << 20

  /** -Dgraft.sa.deepwindow=0 forces the descent path for every saturated
    * pair — the A/B measurement knob and the spec's equivalence pin. */
  private def deepWindowEnabled = !sys.props.get("graft.sa.deepwindow").contains("0")

  /** EXACT-substring corpus REWRITE — the end of the Lee et al. pipeline
    * (their §4: cut every duplicated span, keep one occurrence): for each
    * [[duplicateSpansFrom]] row, the rank-t side `[off_a, off_a+len)` of
    * doc_a is CUT. Occurrences of a duplicated substring occupy a
    * contiguous rank interval, and every occurrence except the rank-
    * minimal one is the rank-t side of its pair with its predecessor —
    * so each duplicated region survives at (at least) its rank-minimal
    * occurrence, and every cut character is verbatim-duplicated at its
    * span's (doc_b, off_b) by construction. Overlapping cuts are merged
    * per doc before the rewrite.
    *
    * Returns (id, n_cut = characters removed, cleaned = rewritten text).
    * Plan shape: the span pass, then a doc-PARTITIONED window merge over
    * the cut intervals (per-doc interval count ≤ |doc|/1 — partition-
    * local, never global), one groupBy(id) collecting the ≤|doc|-entry
    * merged list, and a single codegen'd higher-order `aggregate` fold
    * that stitches the kept segments — the corpus is rewritten in one
    * map pass, no per-segment explode. */
  def cleanedCorpus(idx: SaIndex, docs: DataFrame, minLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = duplicateSpansFrom(idx, docs, minLen)
    val cuts = spans.select(col("doc_a").as("id"), col("off_a").as("cs"),
      (col("off_a") + col("span_len")).as("ce"))
    val w = Window.partitionBy("id").orderBy("cs", "ce")
    val marked = cuts.withColumn("brk",
      when(col("cs") > coalesce(
        max(col("ce")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(-1L)), 1L).otherwise(0L))
    val merged = marked.withColumn("grp", sum(col("brk")).over(w))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("cs")).as("cs"), max(col("ce")).as("ce"))
    val cutList = merged.groupBy("id")
      .agg(sort_array(collect_list(struct(col("cs"), col("ce")))).as("cuts"))
    docs.join(cutList, Seq("id"), "left")
      .withColumn("cleaned",
        when(col("cuts").isNull, col("text")).otherwise(expr(
          // fold over the sorted disjoint cut intervals: carry (pos, acc),
          // emit the gap before each cut, then the tail after the last
          """aggregate(cuts,
            |  named_struct('pos', 0L, 'acc', ''),
            |  (st, c) -> named_struct(
            |    'pos', c.ce,
            |    'acc', concat(st.acc,
            |      substring(text, CAST(st.pos + 1 AS INT),
            |        CAST(c.cs - st.pos AS INT)))),
            |  st -> concat(st.acc,
            |    substring(text, CAST(st.pos + 1 AS INT),
            |      CAST(length(text) - st.pos AS INT))))""".stripMargin)))
      .select(col("id"),
        (length(col("text")) - length(col("cleaned"))).cast("long").as("n_cut"),
        col("cleaned"))
  }

  /** The k-GRAM WITNESS INDEX over a corpus — the exact-substring
    * family's third persisted artifact (beside the final SA and its rank
    * history; SparkEntry.saIndexMemo writes all three together), and the
    * one the INGEST probe ([[ingestDuplicateSpans]]) consumes: one row
    * per DISTINCT doc-local k-gram of the corpus, carrying its
    * lexicographically-first (doc, off) occurrence as the witness.
    *
    * Why this shape and not a relational binary search of the stored SA:
    * locating one batch suffix in the SA is ceil(log2 n) driver-
    * coordinated rounds, each needing corpus-character access at the
    * probed positions — per DAILY BATCH. The gram table is the same
    * information re-keyed for Spark's strength: build once (one map pass
    * + one groupBy over the n positions the SA build already explodes —
    * no doubling, no sort rounds), then every batch probe is ONE
    * equi-join. k = the dedup minLen, so "batch char inside a duplicated
    * span" ≡ "batch char inside a matched gram" ([[ingestDuplicateSpans]]
    * scaladoc for the containment argument).
    *
    * Scale: n rows, same footprint class as the SA itself; the groupBy
    * shuffles on the gram key (skew-free: a gram repeated r times
    * collapses to one witness row, never r² anything). */
  def gramIndex(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(col("id"), col("text"), length(col("text")).as("tlen"))
      .where(col("tlen") >= k)
      .select(col("id"), col("text"),
        posexplode(sequence(lit(0), col("tlen") - k)).as(Seq("off", "ignored")))
      .select(col("id"), col("off").cast("long").as("off"),
        expr(s"substring(text, off + 1, $k)").as("gram"))
      .groupBy(col("gram"))
      .agg(min(struct(col("id"), col("off"))).as("w"))
      .select(col("gram"), col("w.id").as("doc"), col("w.off").as("off"))

  /** Fold an ACCEPTED batch into the stored [[gramIndex]] WITHOUT
    * re-scanning the corpus — the SA family's index-maintenance half
    * (the [[graft.operators.Dedup.lshIndexAppend]] discipline): tomorrow's
    * batch must see today's accepted docs' grams. Provably ≡ a rebuild
    * over corpus ∪ batch WHEN batch ids exceed every corpus id (the
    * fresh-id ingest contract, max(id)+1-derived): the witness is the
    * lexicographic min (doc, off) per gram, so for a gram the corpus
    * already has, the stored witness always beats any fresh-id batch
    * occurrence and survives unchanged — only grams the corpus has
    * NEVER seen enter, with their batch-local witness. One |batch|-sized
    * map pass + one anti-join against the stored index; nothing
    * corpus-sized shuffles (an un-ordered id space would instead need a
    * groupBy-min over the union — corpus-sized — which is exactly what
    * the contract buys out). SuffixArraySpec pins append ≡ rebuild
    * byte-equality and the requirement's necessity. */
  def gramIndexAppend(stored: DataFrame, batch: DataFrame, k: Int): DataFrame = {
    val fresh = gramIndex(batch, k)
      .join(stored.select("gram"), Seq("gram"), "left_anti")
    stored.unionByName(fresh)
  }

  /** EXACT-substring dedup at INGEST — [[duplicateSpans]]' daily-batch
    * form, probing the STORED [[gramIndex]] with one equi-join instead of
    * rebuilding the suffix array over corpus ∪ batch (the reference's own
    * discipline is incremental chunked processing,
    * shard_by_distance.py:149-158; the SA rebuild is the 100×-scale
    * 369 s artifact a daily batch must never pay).
    *
    * Returns, per batch doc, the MAXIMAL RUNS of corpus-duplicated
    * characters: (id, span_start, span_len, witness_doc, witness_off),
    * span_len ≥ k, witness = the stored witness of the run's first
    * matched gram. A batch char is duplicated iff it lies inside a
    * ≥ k-char substring occurring verbatim in the corpus — and that is
    * EXACTLY "inside a matched k-gram": a matched gram IS such a
    * substring (⊇), and any ≥ k-char duplicated span covers each of its
    * chars with an in-span k-gram, each verbatim-in-corpus because a
    * substring of an occurring string occurs (⊆). So the coverage is
    * exact with NO corpus-text access at probe time at all — tighter
    * than the LSH probe (q179), which still re-shingles candidate
    * reference docs. A reported run may CHAIN overlapping grams whose
    * witnesses differ (the run as a whole need not be contiguous
    * anywhere in the corpus); every char of it is still inside some
    * ≥ k duplicated substring, which is the cut-eligibility the Lee et
    * al. rewrite needs (SuffixArraySpec pins both the chained case and
    * brute-force coverage equality).
    *
    * Plan shape: batch positions are map-only (|batch| rows); ONE gram
    * equi-join against the stored index (batch side tiny → broadcast-
    * able); the islands merge is a batch-doc-partitioned window; one
    * groupBy. Nothing touches the corpus, nothing is pairwise. */
  def ingestDuplicateSpans(gramIdx: DataFrame, batch: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = batch
      .select(col("id"), col("text"), length(col("text")).as("tlen"))
      .where(col("tlen") >= k)
      .select(col("id"), col("text"),
        posexplode(sequence(lit(0), col("tlen") - k)).as(Seq("off", "ignored")))
      .select(col("id"), col("off").cast("long").as("off"),
        expr(s"substring(text, off + 1, $k)").as("gram"))
    val matched = bg.join(
      gramIdx.select(col("gram"), col("doc").as("wdoc"), col("off").as("woff")),
      Seq("gram"))
    // gaps-and-islands over the fixed-length [off, off+k) intervals:
    // touching runs merge (the cleanedCorpus cut-merge rule)
    val w = Window.partitionBy(col("id")).orderBy(col("off"))
    matched
      .withColumn("brk",
        when(col("off") > coalesce(
          max(col("off") + k).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1L)), 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(w))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("off")).as("span_start"),
        (max(col("off")) + k - min(col("off"))).as("span_len"),
        min(struct(col("off"), col("wdoc"), col("woff"))).as("wit"))
      .select(col("id"), col("span_start"), col("span_len"),
        col("wit.wdoc").as("witness_doc"), col("wit.woff").as("witness_off"))
  }

  /** [[duplicateSpans]] over an already-built [[SaIndex]] — the
    * build-once / consume-many split a production corpus runs (the SA is
    * the expensive artifact; span extraction is a pass over it).
    *
    * Fast path (the lever that makes exact spans affordable at corpus
    * scale): every adjacent pair first compares the two suffixes'
    * W-character DOC-LOCAL windows (text from the offset, terminator
    * appended) with the codegen'd [[graft.functions.CommonPrefixLen]] —
    * two equi-joins and a per-row byte loop instead of log(n) rank-table
    * rounds. The window verdict is FINAL for the clipped span whenever
    * (a) the windows mismatch inside W, or (b) either side's terminator
    * is within W (the clip caps the span there anyway): the window
    * diverges from the raw corpus only past the terminator, and the
    * reported span is min(lcp, dist_a, dist_b), which those characters
    * can never move. Only window-SATURATED pairs — W matching characters
    * with both terminators beyond W, i.e. a genuine ≥ W-char duplicate —
    * take a SECOND window probe at FULL CLIP WIDTH (r12): the reported
    * span is least(lcp, dist_a, dist_b), and a doc-local window of width
    * m = least(dist_a, dist_b) satisfies CPL(win_a, win_b) = min(lcp, m)
    * exactly — below m both windows are still inside their doc text, so
    * character equality tracks the corpus until either the true
    * divergence (< m) or the window end (= m) — hence
    * least(CPL, dist_a, dist_b) = least(lcp, dist_a, dist_b)
    * unconditionally, same as the rank descent's clipped answer. The
    * probe is two equi-joins of the saturated set (broadcast) against
    * the doc table — O(|saturated| × doc-tail) bytes, no rank-history
    * access, and crucially no log(cap) SEQUENTIAL checkpoint rounds
    * (measured ~0.3-0.5 s of fixed job/planning floor per round
    * regardless of row count). An adversarially duplicate-heavy corpus
    * — saturated pairs past [[DeepWindowPairs]] rows or
    * [[DeepWindowBytes]] summed clip width, where per-pair doc-tail
    * payloads stop being the cheap side — falls back to the capped
    * [[lcpDescent]], whose rounds carry ranks, never text. The DuckDB
    * oracle replays the pure descent for every pair; all forms agree on
    * every clipped span by the argument above (SuffixArraySpec pins the
    * window path ≡ the forced-descent path on >=W-char duplicates;
    * -Dgraft.sa.deepwindow=0 forces the descent for A/B and tests). */
  def duplicateSpansFrom(idx: SaIndex, docs: DataFrame,
      minLen: Int): DataFrame = {
    val offs = Packing.packCounts(
        docs.select(col("id"), (length(col("text")) + 1).as("n")),
        blockTokens = Long.MaxValue)
      .select(col("id"), col("start_off"))
    // (pos, doc, off, dist = chars to the doc's terminator, win = the
    // W-char doc-local probe window)
    val posDoc = docs.join(offs, "id")
      .select(col("id"), col("start_off"), length(col("text")).as("tlen"),
        concat(col("text"), lit("")).as("padded"))
      .select(col("id"), col("start_off"), col("tlen"), col("padded"),
        posexplode(sequence(lit(0), col("tlen"))).as(Seq("off", "ignored")))
      .select(col("id"), (col("start_off") + col("off")).as("pos"),
        col("off").cast("long").as("off"),
        (col("tlen") - col("off")).cast("long").as("dist"),
        expr(s"substring(padded, off + 1, $W)").as("win"))
    val da = posDoc.select(col("pos").as("pos_a"), col("id").as("doc_a"),
      col("off").as("off_a"), col("dist").as("dist_a"), col("win").as("win_a"))
    val db = posDoc.select(col("pos").as("pos_b"), col("id").as("doc_b"),
      col("off").as("off_b"), col("dist").as("dist_b"), col("win").as("win_b"))
    val probed = adjacentPairs(idx)
      .join(da, Seq("pos_a"))
      .join(db, Seq("pos_b"))
      .withColumn("l64", graft.functions.TextExpressions
        .commonPrefixLen(col("win_a"), col("win_b")))
      .drop("win_a", "win_b")
      .pipe(Ckpt.cut)
    val saturated = col("l64") === W &&
      least(col("dist_a"), col("dist_b")) >= W
    val resolved = probed.where(!saturated)
      .select(col("doc_a"), col("off_a"), col("doc_b"), col("off_b"),
        least(col("l64"), col("dist_a"), col("dist_b")).as("span_len"))
    // ONE job sizes the deep strategy (count + summed clip width) and, for
    // the descent fallback, its round cap: no value beyond the pair set's
    // max min-side distance is ever observable after the clip
    val statRow = probed.where(saturated)
      .agg(count(lit(1)),
        sum(least(col("dist_a"), col("dist_b"))),
        max(least(col("dist_a"), col("dist_b")))).head
    val nDeep = statRow.getLong(0)
    val deepBytes = if (statRow.isNullAt(1)) 0L else statRow.getLong(1)
    val deep =
      if (nDeep == 0L)
        // no saturated pair: neither deep path runs (even the descent's
        // empty fast path pays a checkpoint + count)
        probed.where(lit(false))
          .select(col("doc_a"), col("off_a"), col("doc_b"), col("off_b"),
            lit(0L).as("span_len"))
      else if (deepWindowEnabled && nDeep <= DeepWindowPairs &&
          deepBytes <= DeepWindowBytes) {
        // full-clip-width window probe (scaladoc): two broadcast joins of
        // the saturated set against the doc table, pair side broadcast —
        // the doc table streams map-side, nothing shuffles, no rounds
        val pairsB = broadcast(probed.where(saturated)
          .select(col("doc_a"), col("off_a"), col("doc_b"), col("off_b"),
            col("dist_a"), col("dist_b")))
        val withA = docs
          .select(col("id").as("doc_a"), col("text").as("text_a"))
          .join(pairsB, Seq("doc_a"))
          .withColumn("win_a", expr(
            "substring(text_a, CAST(off_a + 1 AS INT), " +
              "CAST(least(dist_a, dist_b) AS INT))"))
          .drop("text_a")
        docs.select(col("id").as("doc_b"), col("text").as("text_b"))
          .join(broadcast(withA), Seq("doc_b"))
          .withColumn("win_b", expr(
            "substring(text_b, CAST(off_b + 1 AS INT), " +
              "CAST(least(dist_a, dist_b) AS INT))"))
          .select(col("doc_a"), col("off_a"), col("doc_b"), col("off_b"),
            least(graft.functions.TextExpressions.commonPrefixLen(
                col("win_a"), col("win_b")),
              col("dist_a"), col("dist_b")).as("span_len"))
      } else {
        val needCap = statRow.getLong(2)
        lcpDescent(idx,
            probed.where(saturated).select(col("rank"), col("pos_a"), col("pos_b")),
            maxNeededLcp = Some(needCap))
          .join(probed.select(col("rank"), col("doc_a"), col("off_a"),
            col("doc_b"), col("off_b"), col("dist_a"), col("dist_b")), Seq("rank"))
          .select(col("doc_a"), col("off_a"), col("doc_b"), col("off_b"),
            least(col("lcp"), col("dist_a"), col("dist_b")).as("span_len"))
      }
    resolved.unionByName(deep)
      .where(col("span_len") >= minLen)
  }
}
