package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val toks = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
    (1 to 100).map(i => s"uniq$i")

  test("count-min: estimates dominate true counts; exact when uncollided") {
    val df = toks.toDF("tok")
    val cms = Sketches.countMinSketch(df, d = 4, w = 256)
    val probes = Seq("alpha", "beta", "uniq1", "absent").toDF("tok")
    val est = Sketches.cmsEstimate(cms, probes, d = 4, w = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 50L && est("beta") >= 20L && est("uniq1") >= 1L)
    // with 170 tokens in 4x256 buckets, heavy hitters are near-exact
    assert(est("alpha") <= 60L && est("beta") <= 30L)
    assert(est("absent") <= 5L) // only collision mass
  }

  test("count-min counters are merge-order independent (pure sums)") {
    val whole = Sketches.countMinSketch(toks.toDF("tok"), d = 2, w = 32)
    val (a, b) = toks.splitAt(70)
    val merged = Sketches.countMinSketch(a.toDF("tok"), d = 2, w = 32)
      .unionByName(Sketches.countMinSketch(b.toDF("tok"), d = 2, w = 32))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("bloom: no false negatives; position sets merge by union; packed test agrees") {
    import org.apache.spark.sql.functions._
    val keys = (0 until 200).map(i => s"key-$i")
    val df = keys.toDF("key")
    val bloom = Sketches.bloomBits(df, "key", m = 4096, k = 4)
    val words = Sketches.packBloom(bloom, m = 4096)
    // every inserted key must hit (no false negatives)
    val members = df.withColumn("hit", Sketches.bloomHitCol(words, col("key"), m = 4096, k = 4))
    assert(members.where(!col("hit")).count() === 0)
    // non-members mostly miss (fp rate for n=200, m=4096, k=4 is ~0.1%)
    val others = (1000 until 1200).map(i => s"other-$i").toDF("key")
      .withColumn("hit", Sketches.bloomHitCol(words, col("key"), m = 4096, k = 4))
    assert(others.where(col("hit")).count() <= 5)
    // split-insert merges by union to the whole-corpus filter
    val (a, b) = keys.splitAt(70)
    val merged = Sketches.bloomBits(a.toDF("key"), "key", m = 4096, k = 4)
      .unionByName(Sketches.bloomBits(b.toDF("key"), "key", m = 4096, k = 4))
      .distinct()
    assert(bloom.exceptAll(merged).isEmpty && merged.exceptAll(bloom).isEmpty)
  }

  test("incremental dedup: planted copies flagged, clean rows pass") {
    import org.apache.spark.sql.functions._
    val ref = (0L until 100L).map(i => (i, s"reference document number $i with unique content"))
      .toDF("id", "text")
    val incoming = (100L until 150L).map(i => (i, s"fresh document $i never seen before"))
      .toDF("id", "text")
      .unionByName(ref.where(col("id") % 10 === 0)
        .select((col("id") + 1000).as("id"), col("text")))
    val r = graft.operators.Dedup.incrementalDedup(ref, incoming)
      .collect().map(x => x.getLong(0) -> ((x.getBoolean(1), x.getBoolean(2)))).toMap
    // all 10 planted copies: bloom hit AND verified dup
    (0L until 100L by 10L).foreach(i => assert(r(i + 1000) === ((true, true))))
    // fresh rows are never is_dup (bloom fps possible but must verify false)
    (100L until 150L).foreach(i => assert(r(i)._2 === false))
  }

  test("hll: estimate lands near the true distinct count; registers merge by max") {
    val df = toks.toDF("tok")
    val trueDistinct = toks.distinct.size // 102
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df))
      .head().getDouble(1)
    assert(est > trueDistinct * 0.7 && est < trueDistinct * 1.3,
      s"estimate $est vs true $trueDistinct")
    // split-merge by max == whole-corpus registers
    val (a, b) = toks.splitAt(70)
    val merged = Sketches.hllRegisters(a.toDF("tok"))
      .unionByName(Sketches.hllRegisters(b.toDF("tok")))
      .groupBy("register").agg(max("m").as("m"))
    assert(Sketches.hllRegisters(df).exceptAll(merged).isEmpty)
  }

  test("histogram sketch: hand-grid quantiles, edge clamp, pure-sum merge") {
    // 0..99 over [0,100) x 10 bins -> 10 per bin; upper-edge estimates
    val vals = (0 until 100).map(_.toDouble).toDF("v")
    val hist = Sketches.histState(vals, "v", lo = 0.0, hi = 100.0, bins = 10)
    val q = Sketches.histQuantiles(hist, 0.0, 100.0, bins = 10,
        qs = Seq(0.5, 0.95)).collect()
      .map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(q(0.5) === 50.0) // cum reaches 50 at bin 4; upper edge 50
    assert(q(0.95) === 100.0) // bin 9
    // outliers clamp into the edge bins, never drop
    val clamped = Sketches.histState(Seq(-5.0, 500.0).toDF("v"), "v",
      0.0, 100.0, bins = 10).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(clamped(0) === 1L && clamped(9) === 1L)
    // state is pure sums: split-merge == whole
    val (a, b) = (0 until 100).map(_.toDouble).splitAt(30)
    val merged = Sketches.histState(a.toDF("v"), "v", 0.0, 100.0, 10)
      .unionByName(Sketches.histState(b.toDF("v"), "v", 0.0, 100.0, 10))
      .groupBy("bin").agg(sum("cnt").as("cnt"))
    assert(hist.exceptAll(merged).isEmpty && merged.exceptAll(hist).isEmpty)
  }

  test("per-group hll: registers/estimates match the single-group kernel per key") {
    val df = toks.map(t => (if (t.startsWith("uniq")) "u" else "ab", t))
      .toDF("grp", "tok")
    val regs = Sketches.hllRegistersBy(df, "grp")
    for (g <- Seq("u", "ab")) {
      val single = Sketches.hllRegisters(df.where(col("grp") === g).select("tok"))
      val grouped = regs.where(col("grp") === g).select("register", "m")
      assert(single.exceptAll(grouped).isEmpty && grouped.exceptAll(single).isEmpty)
      val estBy = Sketches.hllEstimateBy(regs, "grp")
        .where(col("grp") === g).head().getDouble(2)
      assert(estBy === Sketches.hllEstimate(single).head().getDouble(1))
    }
    // MAX-merge of the per-group state == registers over the whole corpus
    val allFromState = regs.groupBy("register").agg(max("m").as("m"))
    val whole = Sketches.hllRegisters(df.select("tok"))
    assert(whole.exceptAll(allFromState).isEmpty &&
      allFromState.exceptAll(whole).isEmpty)
  }

  test("heavyHitters: exactly the brute-force heavy set; CMS pre-filter prunes the shuffle") {
    import spark.implicits._
    // 100×"alpha", 60×"beta", 40×"gamma", 400 singletons; N=600
    val toks = (Seq.fill(100)("alpha") ++ Seq.fill(60)("beta") ++
      Seq.fill(40)("gamma") ++ (0 until 400).map(i => s"rare-$i")).toDF("tok")
    // invPhi=12 -> T = 600/12 = 50: alpha+beta qualify, gamma (40) must not
    val got = Sketches.heavyHitters(toks, invPhi = 12, d = 4, w = 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("alpha" -> 100L, "beta" -> 60L))
    // the pre-filter is a genuine shuffle reduction: far fewer candidate
    // ROWS than the corpus (collision strays allowed, the exact cut is
    // what guarantees the result above)
    val counters = Sketches.packCms(Sketches.countMinSketch(toks, 4, 512), 4, 512)
    val survivors = toks.where(Sketches.cmsEstCol(counters, col("tok"), 4, 512) >= 50).count()
    assert(survivors >= 160 && survivors < 300, s"pre-filter passed $survivors rows")
  }

  test("heavyHitters xx64 backend: same exact answer as md5; pre-filter still prunes") {
    import spark.implicits._
    val toks = (Seq.fill(100)("alpha") ++ Seq.fill(60)("beta") ++
      Seq.fill(40)("gamma") ++ (0 until 400).map(i => s"rare-$i")).toDF("tok")
    // the answer {tok : count >= N/invPhi} is hash-independent: N is the
    // exact token total under any backend and est >= truth always holds
    val md5Res = Sketches.heavyHitters(toks, invPhi = 12, d = 4, w = 512)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val xxRes = Sketches.heavyHitters(toks, invPhi = 12, d = 4, w = 512, hash = "xx64")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(xxRes === md5Res)
    assert(xxRes === Map("alpha" -> 100L, "beta" -> 60L))
    // and the xx64 CMS is still a genuine pre-filter, not a pass-through
    val counters = Sketches.packCms(
      Sketches.countMinSketch(toks, 4, 512, hash = "xx64"), 4, 512)
    val survivors = toks.where(
      Sketches.cmsEstCol(counters, col("tok"), 4, 512, hash = "xx64") >= 50).count()
    assert(survivors >= 160 && survivors < 300, s"xx64 pre-filter passed $survivors rows")
  }

  test("bloom xx64 backend: build/probe position parity, no false negatives, prunes") {
    import org.apache.spark.sql.functions._
    val keys = (0 until 200).map(i => s"key-$i")
    val df = keys.toDF("key")
    val words = Sketches.packBloom(
      Sketches.bloomBits(df, "key", m = 4096, k = 4, hash = "xx64"), m = 4096)
    // build/probe parity: every inserted key's k probe positions are set
    // (the two code paths derive positions independently — this is the
    // bit-position agreement contract under the fixed "bloomj" seeds)
    val members = df.withColumn("hit",
      Sketches.bloomHitCol(words, col("key"), m = 4096, k = 4, hash = "xx64"))
    assert(members.where(!col("hit")).count() === 0)
    // non-members mostly miss, i.e. xx64 actually spreads (fp ~0.1%)
    val others = (1000 until 1200).map(i => s"other-$i").toDF("key")
      .withColumn("hit",
        Sketches.bloomHitCol(words, col("key"), m = 4096, k = 4, hash = "xx64"))
    assert(others.where(col("hit")).count() <= 5)
    // and the two backends are genuinely different hash families — same
    // keys, same (m, k), different position sets (a regression that
    // silently collapsed xx64 onto md5 would pass every other assertion)
    val md5Bits = Sketches.bloomBits(df, "key", m = 4096, k = 4).collect().map(_.getLong(0)).toSet
    val xxBits = Sketches.bloomBits(df, "key", m = 4096, k = 4, hash = "xx64")
      .collect().map(_.getLong(0)).toSet
    assert(md5Bits != xxBits)
  }

  test("bloom runtime-filter join reduction: pre-filtered join equals plain join") {
    import spark.implicits._
    val build = Seq(("10", "x"), ("20", "y")).toDF("k", "attr")
    val probe = (1 to 100).map(i => (i.toString, i.toLong)).toDF("k", "v")
    val words = Sketches.packBloom(Sketches.bloomBits(build.select(col("k")), "k", m = 256, k = 3), m = 256)
    val reduced = probe.where(Sketches.bloomHitCol(words, col("k"), m = 256, k = 3))
      .join(build, Seq("k"))
    val plain = probe.join(build, Seq("k"))
    val key = (r: org.apache.spark.sql.Row) => (r.getString(0), r.getLong(1), r.getString(2))
    assert(reduced.collect().map(key).toSet === plain.collect().map(key).toSet)
    // and the bloom actually prunes: far fewer probe rows survive than 100
    val survivors = probe.where(Sketches.bloomHitCol(words, col("k"), m = 256, k = 3)).count()
    assert(survivors >= 2 && survivors < 50)
  }
}
