package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.roundHU

/** Deterministic, MERGEABLE sketches — the bounded-state approximate
  * aggregations a 100 TB analytics engine runs where exact answers don't
  * fit: Count-Min frequency estimation and HyperLogLog distinct counting.
  *
  * Both are expressed as plain relational aggregations whose state is the
  * sketch itself (d·w counters / 2^b registers): counters are pure SUMS and
  * registers pure MAXes, so partial aggregation (map-side combine) and
  * any merge order give bit-identical sketches — which is also what makes
  * them oracle-able cross-engine, unlike seeded-random implementations.
  * Hashes are md5-derived (engine-portable hex arithmetic).
  */
object Sketches {

  /** Unsigned 32-bit hash of (prefix, tok) — two parity-of-contract
    * backends (the [[bloomPos]] discipline, extended to the whole h32
    * sketch family):
    *  - "md5": first 8 hex digits of md5(prefix:tok), engine-portable hex
    *    arithmetic — the oracle-replayable path, REQUIRED wherever sketch
    *    state (registers, counters, estimates) reaches the result set.
    *  - "xx64": codegen'd XXH64 folded to 32 bits — one 64-bit mix per
    *    row vs a digest + hex parse + conv. Spark-only, so valid ONLY
    *    where the sketch never reaches the output: pre-filters and
    *    hash-independent exact answers (e.g. [[heavyHitters]], whose
    *    result {tok : count >= N/invPhi} is the same under ANY hash
    *    because est >= truth holds for every CMS). */
  private def h32(tok: Column, prefix: Column, hash: String = "md5"): Column = hash match {
    case "md5"  => conv(substring(md5(concat(prefix, lit(":"), tok)), 1, 8), 16, 10).cast("long")
    case "xx64" => pmod(xxhash64(concat(prefix, lit(":"), tok)), lit(1L << 32))
    case other  => throw new IllegalArgumentException(s"h32 hash: $other")
  }

  /** Bloom bit position of `key` under hash function j — two parity-locked
    * backends (build and probe MUST pass the same `hash`):
    *  - "md5":  engine-portable hex arithmetic, replayable in the DuckDB
    *    oracle (4 md5 digests per probe row — the demo/verification path).
    *  - "xx64": codegen'd XXH64 over ("bloomj", key) — one 64-bit mix per
    *    hash, the at-scale probe (no digest, no hex parse, no conv). Spark-
    *    only, so queries using it must keep the bloom OUT of the oracle'd
    *    result (sound for pre-filters: no false negatives either way). */
  private def bloomPos(key: Column, j: Column, m: Int, hash: String): Column = hash match {
    case "md5"  => pmod(h32(key, concat(lit("bloom"), j.cast("string"))), lit(m))
    case "xx64" => pmod(xxhash64(concat(lit("bloom"), j.cast("string")), key), lit(m))
    case other  => throw new IllegalArgumentException(s"bloom hash: $other")
  }

  /** Bloom-filter bit positions of a key column: each key sets k
    * hash-derived positions in [0, m). The distinct position set IS the
    * filter — pure set-union state, so it is mergeable in any order and
    * bounded by m regardless of corpus size (at scale: an agg to a real
    * m-bit bitmap; the position-set form is the oracle-able equivalent).
    * No false negatives by construction; false-positive rate ≈
    * (1 - e^(-k·n/m))^k. */
  def bloomBits(keys: DataFrame, keyCol: String, m: Int = 16384, k: Int = 4,
      hash: String = "md5"): DataFrame =
    keys
      .select(explode(sequence(lit(0), lit(k - 1))).as("j"), col(keyCol).as("key"))
      .select(bloomPos(col("key"), col("j"), m, hash).as("pos"))
      .distinct()

  /** Pack a `bloomBits` position set into m/32 words of 32 bits each
    * (values < 2^32 so every word is EXACT as a double — the same
    * pure-double bit convention as the HLL rho extraction). A driver
    * artifact like the centroid sets: m bits regardless of corpus size. */
  def packBloom(bloom: DataFrame, m: Int): Array[Long] = {
    val words = new Array[Long](m / 32)
    bloom.collect().foreach { r =>
      val pos = r.getLong(0)
      words((pos >> 5).toInt) |= 1L << (pos & 31)
    }
    words
  }

  /** Map-only membership test against the packed broadcast bitmap:
    * `bloom_hit` iff ALL k positions of the key are set. No join, no
    * shuffle of the probe side — the filter rides the plan as a literal
    * word array and each test is floor/pow double arithmetic (replayable
    * cross-engine, equivalent to `pos IN positions` for every position). */
  def bloomHitCol(words: Array[Long], key: Column, m: Int = 16384, k: Int = 4,
      hash: String = "md5"): Column = {
    val wordsLit = typedLit(words.toSeq)
    (0 until k)
      .map { j =>
        val pos = bloomPos(key, lit(j), m, hash)
        // bit extraction stays in exact-double floor/pow arithmetic (word
        // values < 2^32) so the md5 path replays verbatim in the oracle;
        // for xx64 the extraction cost is noise next to the hash swap
        val word = element_at(wordsLit, floor(pos / lit(32.0)).cast("int") + 1).cast("double")
        pmod(floor(word / pow(lit(2.0), pmod(pos, lit(32)).cast("double"))), lit(2.0)) === lit(1.0)
      }
      .reduce(_ && _)
  }

  /** Count-min sketch of a token multiset: d hash rows × w buckets,
    * (row, bucket, cnt) — state bounded by d·w regardless of corpus size. */
  def countMinSketch(tokens: DataFrame, d: Int = 4, w: Int = 64,
      hash: String = "md5"): DataFrame =
    tokens
      .select(explode(sequence(lit(0), lit(d - 1))).as("row"), col("tok"))
      .withColumn("bucket", pmod(h32(col("tok"), col("row").cast("string"), hash), lit(w)))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Pack a [[countMinSketch]] DF into its literal d·w counter array
    * (index row·w + bucket; absent buckets 0) — a bounded driver artifact
    * like the Bloom words, broadcast into map-only probe expressions. */
  def packCms(cms: DataFrame, d: Int, w: Int): Array[Long] = {
    val arr = new Array[Long](d * w)
    // select by NAME with explicit casts: a column reorder or type change
    // in countMinSketch must not silently mis-pack the counters
    cms.select(col("row").cast("int"), col("bucket").cast("int"),
        col("cnt").cast("long"))
      .collect().foreach { r =>
        arr(r.getInt(0) * w + r.getInt(1)) = r.getLong(2)
      }
    arr
  }

  /** Map-only CMS point estimate of `tok`'s frequency against the packed
    * broadcast counters (the literal-array twin of [[bloomHitCol]]): min
    * over the d rows of the token's bucket counter. est >= truth ALWAYS
    * (counters only ever over-count on collisions) — the property that
    * makes the [[heavyHitters]] cut exact. */
  def cmsEstCol(counters: Array[Long], tok: Column, d: Int, w: Int,
      hash: String = "md5"): Column = {
    val arr = typedLit(counters.toSeq)
    (0 until d)
      .map { r =>
        element_at(arr,
          (pmod(h32(tok, lit(r.toString), hash), lit(w)) + lit(r.toLong * w)).cast("int") + 1)
      }
      .reduce(least(_, _))
  }

  /** EXACT heavy hitters by the sketch-guided two-pass:
    *  1) one scan builds the CMS (d·w ints, a driver artifact); the total
    *     token count N is the sum of any single row's counters, so the
    *     threshold T = max(1, N/invPhi) derives from the sketch with no
    *     extra pass;
    *  2) the probe scan filters tokens MAP-ONLY to CMS-est >= T before
    *     the exact groupBy — the count shuffle carries only candidates
    *     (<= invPhi true heavy keys + collision strays), never the full
    *     vocabulary — and the final n >= T cut discards the strays.
    * CMS never underestimates, so no true heavy hitter can be dropped:
    * the result is EXACTLY `{tok : count(tok) >= T}` independent of
    * sketch size; w only tunes how much the shuffle shrinks. The 100 TB
    * shape for "top terms over a corpus whose vocabulary doesn't fit". */
  def heavyHitters(tokens: DataFrame, invPhi: Long, d: Int = 4, w: Int = 2048,
      hash: String = "md5"): DataFrame = {
    val counters = packCms(countMinSketch(tokens, d, w, hash), d, w)
    // N is a row's counter SUM = total token count — identical under any
    // hash backend, so the threshold (and thus the exact answer) is too
    val n = counters.take(w).sum
    val t = math.max(1L, n / invPhi)
    tokens
      .where(cmsEstCol(counters, col("tok"), d, w, hash) >= t)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= t)
  }

  /** Point-frequency estimates: min over rows of the probe token's bucket
    * counter (absent bucket = 0). Classic CMS guarantee: est >= truth,
    * over-estimation bounded by collisions. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, d: Int = 4, w: Int = 64): DataFrame =
    probes
      .select(col("tok")).distinct()
      .select(col("tok"), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .withColumn("bucket", pmod(h32(col("tok"), col("row").cast("string")), lit(w)))
      .join(cms, Seq("row", "bucket"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** HyperLogLog registers over a token column: register index = top b bits
    * of the 32-bit hash, rho = 1 + leading zeros of the remaining 32-b bits
    * (32-b+1 when they are all zero). One (register, max rho) row per used
    * register. */
  def hllRegisters(tokens: DataFrame, b: Int = 8): DataFrame = {
    val bits = 32 - b
    val v = h32(col("tok"), lit("hll"))
    val register = floor(v / pow(lit(2.0), lit(bits))).cast("long")
    val rest = pmod(v, pow(lit(2.0), lit(bits)).cast("long"))
    // smallest set-bit position in `rest` (1-based from the top), else bits+1
    val rho = coalesce(
      array_min(filter(sequence(lit(1), lit(bits)),
        j => pmod(floor(rest / pow(lit(2.0), lit(bits) - j)).cast("long"), lit(2)) === 1)),
      lit(bits + 1))
    tokens
      .select(register.as("register"), rho.as("rho"))
      .groupBy(col("register"))
      .agg(max(col("rho")).as("m"))
  }

  /** Mergeable equal-width histogram sketch of a value column: bin counts
    * over a fixed [lo, hi) grid (outliers clamp into the edge bins). Pure
    * SUM state like the CMS counters — map-side combine applies, merges
    * are order-independent, and the state is `bins` rows regardless of
    * input size: the 100 TB percentile path when the exact two-phase
    * sweep (q90) isn't worth a second pass. */
  def histState(values: DataFrame, valueCol: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    val width = (hi - lo) / bins
    values
      .select(least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol) - lit(lo)) / lit(width)).cast("int"))).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a [[histState]] sketch: for each q, the
    * UPPER EDGE of the first bin whose cumulative count reaches q·N —
    * error is bounded by one bin width by construction. The cumulative
    * window runs over the ≤`bins`-row sketch itself (sketch-sized, never
    * data-sized — the one place a single-partition window is exactly
    * right). Estimates are rHU-rounded for cross-engine hashing. */
  def histQuantiles(hist: DataFrame, lo: Double, hi: Double, bins: Int,
      qs: Seq[Double]): DataFrame = {
    val width = (hi - lo) / bins
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val total = hist.agg(sum(col("cnt")).as("total"))
    val qdf = hist.sparkSession.createDataFrame(
      qs.map(Tuple1.apply)).toDF("q")
    cum.crossJoin(total).crossJoin(broadcast(qdf))
      .where(col("cum").cast("double") >= col("q") * col("total").cast("double"))
      .groupBy(col("q"))
      .agg(min(col("bin")).as("qbin"))
      .select(col("q"), col("qbin"),
        roundHU(lit(lo) + (col("qbin") + 1).cast("double") * lit(width), 4)
          .as("est"))
  }

  /** [[hllRegisters]] generalized to per-group sketches: one register set
    * per key — the state a distinct-count CUBE keeps. Registers merge by
    * MAX, so any coarser level derives from this state without re-reading
    * the corpus (q138 does exactly that). */
  def hllRegistersBy(tokens: DataFrame, groupCol: String, b: Int = 8): DataFrame = {
    val bits = 32 - b
    val v = h32(col("tok"), lit("hll"))
    val register = floor(v / pow(lit(2.0), lit(bits))).cast("long")
    val rest = pmod(v, pow(lit(2.0), lit(bits)).cast("long"))
    val rho = coalesce(
      array_min(filter(sequence(lit(1), lit(bits)),
        j => pmod(floor(rest / pow(lit(2.0), lit(bits) - j)).cast("long"), lit(2)) === 1)),
      lit(bits + 1))
    tokens
      .select(col(groupCol), register.as("register"), rho.as("rho"))
      .groupBy(col(groupCol), col("register"))
      .agg(max(col("rho")).as("m"))
  }

  /** Per-group HLL estimates from a [[hllRegistersBy]] state (same
    * estimator + small-range correction as [[hllEstimate]]). */
  def hllEstimateBy(registers: DataFrame, groupCol: String, b: Int = 8): DataFrame = {
    val m = 1 << b
    registers
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_used"),
        sum(pow(lit(2.0), -col("m"))).as("__s"))
      .select(
        col(groupCol),
        col("n_used"),
        (lit(0.7213 / (1 + 1.079 / m) * m * m) /
          (col("__s") + (lit(m) - col("n_used")).cast("double"))).as("__raw"),
        (lit(m) - col("n_used")).as("__v"))
      .select(
        col(groupCol),
        col("n_used"),
        roundHU(
          when(col("__raw") <= lit(2.5 * m) && col("__v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
            .otherwise(col("__raw")), 2).as("est"))
  }

  /** HLL estimate with the standard small-range correction:
    * raw E = alpha_m · m² / sum_j 2^(-M_j) (empty registers contributing
    * 2^0); when E <= 2.5m and empty registers remain, linear counting
    * m·ln(m/V) replaces it (the raw estimator is biased high there).
    * The 2^-M terms are exact powers of two, so the double sum is EXACT in
    * any order; ln enters only through the 2-dp rounded output. */
  def hllEstimate(registers: DataFrame, b: Int = 8): DataFrame = {
    val m = 1 << b
    registers
      .agg(
        count(lit(1)).as("n_used"),
        sum(pow(lit(2.0), -col("m"))).as("__s"))
      .select(
        col("n_used"),
        (lit(0.7213 / (1 + 1.079 / m) * m * m) /
          (col("__s") + (lit(m) - col("n_used")).cast("double"))).as("__raw"),
        (lit(m) - col("n_used")).as("__v"))
      .select(
        col("n_used"),
        roundHU(
          when(col("__raw") <= lit(2.5 * m) && col("__v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
            .otherwise(col("__raw")), 2).as("est"))
  }
}
