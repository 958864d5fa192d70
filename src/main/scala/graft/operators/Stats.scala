package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Per-dimension statistics suite — the reference's dataset-analysis jobs
  * used to design the BuddyPQ dimension permutation
  * (/root/reference/src/algorithms/sharding/clustering/{variance,
  * komolgorovsmirnov,multicollinearity,network_*}.py).
  *
  * Everything operates on the long form (id, dim, value) produced by ONE
  * posexplode of the vector column (SURVEY §1.2: columnar access over a
  * row-major table); all-pairs stats join the 64-dim dimension list, not the
  * data, so the data is scanned once per stat family.
  */
object Stats {

  /** Explode points to long form (id, dim, value:double). dim is 0-based. */
  def longForm(points: DataFrame): DataFrame =
    points.select(
      col("id"),
      posexplode(col("vec")).as(Seq("dim", "v")))
      .select(col("id"), col("dim"), col("v").cast("double").as("value"))

  /** Reference-faithful deterministic sample: every dataset statistic in the
    * reference runs on the FIRST sample_size points, never the full table
    * (variance.py:84-90 `read_bin(..., start_idx=0, chunk_size=sample_size)`;
    * komolgorovsmirnov.py and multicollinearity.py share the pattern, with
    * an `assert(sample_size<=100000)` guard). The id-predicate pushes down
    * to the parquet scan, so at 100 TB the all-pairs fan-out below touches a
    * bounded input no matter the table size. sampleSize <= 0 disables. */
  def sampleFirst(points: DataFrame, sampleSize: Int): DataFrame =
    if (sampleSize > 0) points.where(col("id") < sampleSize) else points

  /** Per-dimension variance + binned-frequency entropy
    * (variance.py:90,105-108; utils.py:238-245). Entropy bins on 2-dp
    * rounded values — the reference computes value-frequency entropy, which
    * on continuous data degenerates to ln(n); binning keeps the statistic
    * informative and deterministic. */
  def varianceEntropy(points: DataFrame, entropyBinDp: Int = 2, sampleSize: Int = 0): DataFrame = {
    val lf = longForm(sampleFirst(points, sampleSize))
    val binned = lf
      .groupBy(col("dim"), round(col("value"), entropyBinDp).as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val ent = binned
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("dim"))))
      .groupBy(col("dim"))
      .agg(round(-sum((col("cnt") / col("n")) * log(col("cnt") / col("n"))), 6).as("entropy"))
    val va = lf.groupBy(col("dim")).agg(round(var_pop(col("value")), 6).as("variance"))
    va.join(ent, "dim").select(col("dim"), col("variance"), col("entropy"))
  }

  /** Abramowitz–Stegun 7.1.26 erf approximation (|err| < 1.5e-7) as pure
    * column arithmetic — elementary ops only, so the DuckDB oracle can
    * evaluate the identical formula. */
  def erf(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * ax)
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val e = lit(1.0) - poly * exp(-(ax * ax))
    when(x < 0, -e).otherwise(e)
  }

  /** Standard normal CDF via erf, clamped away from {0,1} so ln() stays
    * finite at extreme z. */
  def phi(z: Column): Column = {
    val p = lit(0.5) * (lit(1.0) + erf(z / lit(1.4142135623730951)))
    least(greatest(p, lit(1e-15)), lit(1.0 - 1e-15))
  }

  /** Anderson–Darling normality statistic per dimension (variance.py:
    * 109-110 — the reference prints scipy.stats.anderson per dim):
    * A² = -n - (1/n) Σ_i [(2i-1) ln Φ(z_(i)) + (2(n-i)+1) ln(1-Φ(z_(i)))]
    * with z standardized by the population mean/std of the dimension. */
  def andersonDarling(points: DataFrame, sampleSize: Int = 0): DataFrame = {
    val s = sampleFirst(points, sampleSize)
    val n = s.count()
    val lf = longForm(s)
    val stats = lf.groupBy(col("dim"))
      .agg(avg(col("value")).as("mu"), stddev_pop(col("value")).as("sd"))
    val ranked = lf
      .join(stats, "dim")
      .withColumn("z", (col("value") - col("mu")) / col("sd"))
      .withColumn("i",
        row_number().over(Window.partitionBy(col("dim")).orderBy(col("value"), col("id"))))
    val contrib =
      (lit(2) * col("i") - 1) * log(phi(col("z"))) +
        (lit(2) * (lit(n) - col("i")) + 1) * log(lit(1.0) - phi(col("z")))
    ranked
      .groupBy(col("dim"))
      .agg(round(-lit(n.toDouble) - sum(contrib) / lit(n.toDouble), 4).as("ad_stat"))
  }

  /** Unordered dimension pairs (dim_i < dim_j). The dimension count is a
    * schema property (fixed-width vectors), so the ≤dim² pair table is
    * built driver-side as a literal — a `dim_i < dim_j` theta-join would
    * plan as a nested loop and pollute the big pipeline's plan. */
  private def dimPairs(points: DataFrame): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // headOption: an empty points table yields an empty pair table (head()
    // would throw NoSuchElementException)
    val d = points.select(size(col("vec"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val rows = for { i <- 0 until d; j <- i + 1 until d } yield (i, j)
    spark.createDataset(rows).toDF("dim_i", "dim_j")
  }

  /** Two-sample Kolmogorov–Smirnov statistic for every dimension pair
    * (komolgorovsmirnov.py:89-115): D = max_x |ECDF_i(x) - ECDF_j(x)|,
    * evaluated at every observed value via a RANGE-frame running count
    * (peers included, so ties are handled exactly). */
  def ksAllPairs(points: DataFrame, sampleSize: Int = 0): DataFrame = {
    // Both samples of every pair have exactly |points| values (each dim is a
    // full column), so the ECDF denominators are a driver scalar — avoids
    // two whole-partition count windows. Both running sums share one window
    // spec => ONE Window operator (one sort pass), not four.
    val s = sampleFirst(points, sampleSize)
    val n = s.count()
    val lf = longForm(s)
    val pairs = dimPairs(s)
    val sideI = pairs.join(lf, col("dim_i") === col("dim"))
      .select(col("dim_i"), col("dim_j"), col("value"), lit(0).as("side"))
    val sideJ = pairs.join(lf, col("dim_j") === col("dim"))
      .select(col("dim_i"), col("dim_j"), col("value"), lit(1).as("side"))
    val u = sideI.unionByName(sideJ)
    val wCum = Window.partitionBy(col("dim_i"), col("dim_j"))
      .orderBy(col("value"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    u.select(col("dim_i"), col("dim_j"),
      sum(when(col("side") === 0, 1).otherwise(0)).over(wCum).as("cum_i"),
      sum(when(col("side") === 1, 1).otherwise(0)).over(wCum).as("cum_j"))
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(round(max(abs(col("cum_i") / lit(n) - col("cum_j") / lit(n))), 6).as("ks"))
  }

  /** Variance-of-concatenation "covariance proxy" for every pair — the
    * reference deliberately uses np.var(concat(dim_i, dim_j))
    * (variance.py:112-135), not true covariance. */
  def covarianceProxy(points: DataFrame, sampleSize: Int = 0): DataFrame = {
    val s = sampleFirst(points, sampleSize)
    val lf = longForm(s)
    val pairs = dimPairs(s)
    // Union of two equi-joins (sideI/sideJ, same shape as ksAllPairs):
    // an OR-predicate join cannot hash-join and degenerates to a
    // BroadcastNestedLoopJoin evaluating every (pair, row) combination.
    val sideI = pairs.join(lf, col("dim_i") === col("dim"))
      .select(col("dim_i"), col("dim_j"), col("value"))
    val sideJ = pairs.join(lf, col("dim_j") === col("dim"))
      .select(col("dim_i"), col("dim_j"), col("value"))
    sideI.unionByName(sideJ)
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(round(var_pop(col("value")), 6).as("var_concat"))
  }

  /** Full sample covariance matrix (i, j, c) over the first-N sample —
    * the d²-sized input PCA power iteration runs on. One long-form
    * self-equi-join on id (sample-bounded, the statSample discipline) +
    * per-pair avgs; entries rHU-rounded to 6 dp so every downstream
    * round replays bit-identically cross-engine. */
  def covMatrix(points: DataFrame, sampleSize: Int = 0): DataFrame = {
    val lf = longForm(sampleFirst(points, sampleSize))
    val mu = lf.groupBy(col("dim")).agg(avg(col("value")).as("mu"))
    lf.select(col("id"), col("dim").as("i"), col("value").as("vi"))
      .join(lf.select(col("id"), col("dim").as("j"), col("value").as("vj")),
        Seq("id"))
      .groupBy(col("i"), col("j"))
      .agg(avg(col("vi") * col("vj")).as("eab"))
      .join(mu.select(col("dim").as("i"), col("mu").as("mi")), Seq("i"))
      .join(mu.select(col("dim").as("j"), col("mu").as("mj")), Seq("j"))
      .select(col("i"), col("j"),
        roundHU(col("eab") - col("mi") * col("mj"), 6).as("c"))
  }

  /** Top principal component by FIXED-ROUND power iteration over a
    * [[covMatrix]] frame: v₀ = 1⃗, vₜ₊₁(i) = rHU(Σⱼ C(i,j)·vₜ(j), 6),
    * final vector unit-normalized (rHU 6). The per-round rounding is what
    * makes a float fixpoint replayable across engines (the Lloyd's-rounds
    * convention, q05); determinism needs no convergence assumption.
    *
    * Scale shape: after the one sample-bounded covariance build, every
    * round is a d²-row × d-row equi-join + per-dim agg — corpus never
    * re-read. Pass a PINNED cov frame (the q107-index discipline): each
    * round re-scans it. The whole dimensionality-reduction family
    * (whitening, PCA projection ahead of IVF/PQ — cf. OPQ's rotation)
    * keys off this vector. */
  def powerIteration(cov: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "powerIteration: rounds must be >= 1")
    var v = cov.select(col("i").as("dim")).distinct()
      .withColumn("comp", lit(1.0))
    for (_ <- 1 to rounds)
      v = cov
        .join(v.select(col("dim").as("j"), col("comp")), Seq("j"))
        .groupBy(col("i"))
        .agg(roundHU(sum(col("c") * col("comp")), 6).as("comp"))
        .select(col("i").as("dim"), col("comp"))
    val n = v.agg(sum(col("comp") * col("comp")).as("ss"))
    v.crossJoin(n)
      .select(col("dim"), roundHU(col("comp") / sqrt(col("ss")), 6).as("comp"))
  }

  /** Pearson correlation for every dimension pair (multicollinearity.py:92-95).
    * Wide join of the long form with itself on id. */
  def corrPairs(points: DataFrame, sampleSize: Int = 0): DataFrame = {
    val lf = longForm(sampleFirst(points, sampleSize))
    val a = lf.select(col("id"), col("dim").as("dim_i"), col("value").as("vi"))
    val b = lf.select(col("id"), col("dim").as("dim_j"), col("value").as("vj"))
    a.join(b, Seq("id"))
      .where(col("dim_i") < col("dim_j"))
      .groupBy(col("dim_i"), col("dim_j"))
      .agg(round(corr(col("vi"), col("vj")), 6).as("corr"))
  }

  /** Top-n pairs by a stat, deterministic ordering (A16). */
  def topPairs(pairStats: DataFrame, statCol: String, n: Int): DataFrame = {
    val w = Window.orderBy(col(statCol).desc, col("dim_i"), col("dim_j"))
    pairStats.withColumn("rn", row_number().over(w)).where(col("rn") <= n).drop("rn")
  }

  /** VIF / multicollinearity matrix: inverse of the full correlation matrix
    * (multicollinearity.py:96-97). The corr matrix is dim x dim (64x64) —
    * a driver-side inverse by design (SURVEY §2 A11); only the matrix
    * assembly is distributed. Returns long form (dim_i, dim_j, vif) for ALL
    * ordered pairs including the diagonal.
    *
    * The inverse is an UNPIVOTED Gauss–Jordan elimination in natural pivot
    * order (a correlation matrix has unit diagonal and is positive definite,
    * so pivots stay well away from zero) — chosen over a library LU/inv
    * because every double op is elementary and ordered, which lets the
    * DuckDB oracle replay the elimination as an unrolled CTE chain
    * (Oracles.gaussJordanCtes) and hash-match bit-for-bit. */
  def vifMatrix(spark: SparkSession, points: DataFrame, sampleSize: Int = 0): DataFrame = {
    import spark.implicits._
    val pairs = corrPairs(points, sampleSize).collect()
    if (pairs.isEmpty) { // empty input: empty result, not a 1×1 identity
      return spark.emptyDataset[(Int, Int, Double)].toDF("dim_i", "dim_j", "vif")
    }
    val d = pairs.iterator.map(r => r.getInt(1)).foldLeft(0)(math.max) + 1
    // augmented [A | I], long-lived as a 2d-wide array
    val a = Array.tabulate(d, 2 * d) { (i, j) =>
      if (j == i || j == d + i) 1.0 else 0.0
    }
    pairs.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    for (k <- 0 until d) {
      val old = a.map(_.clone) // CTE-snapshot semantics: step k reads step k-1
      val p = old(k)(k)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < 2 * d) {
          a(i)(j) =
            if (i == k) old(k)(j) / p
            else old(i)(j) - old(i)(k) * (old(k)(j) / p)
          j += 1
        }
        i += 1
      }
    }
    // roundHU convention (ratio-valued output; see VectorFunctions.roundHU)
    val rows = for (i <- 0 until d; j <- 0 until d)
      yield (i, j, math.floor(a(i)(d + j) * 1e6 + 0.5) / 1e6)
    spark.createDataset(rows).toDF("dim_i", "dim_j", "vif")
  }

  /** Percentile-thresholded similarity graph (network_*.py:85-107): keep
    * edges whose |stat| exceeds the given percentile of |stat|. The stat
    * table is post-aggregation (≤ dim² rows), so it is cached and the
    * threshold collected as a driver scalar — the expensive upstream
    * computation runs exactly once. */
  def buddyGraph(pairStats: DataFrame, statCol: String, pct: Double = 0.75): DataFrame = {
    val cached = pairStats.cache()
    val thr = cached
      .agg(expr(s"percentile(abs($statCol), $pct)")).head().getDouble(0)
    cached
      .where(abs(col(statCol)) > lit(thr))
      .select(col("dim_i").as("src"), col("dim_j").as("dst"),
        col(statCol).cast("double").as("weight"))
  }

  /** Greedy "buddy" ordering of dimensions (network_mutlicollinearity.py:
    * 108-119): walk edges by descending weight, appending unseen endpoints;
    * remaining dims appended in ascending order. Driver-side by design —
    * the graph is at most dim^2 edges. Returns (order_idx, dim). */
  def buddyOrder(spark: SparkSession, edges: DataFrame, nDims: Int): DataFrame = {
    import spark.implicits._
    val es = edges
      .orderBy(col("weight").desc, col("src"), col("dst"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val seen = scala.collection.mutable.LinkedHashSet.empty[Int]
    es.foreach { case (a, b) => seen += a; seen += b }
    (0 until nDims).foreach(seen += _)
    spark.createDataset(seen.toSeq.zipWithIndex.map { case (dim, i) => (i, dim) })
      .toDF("order_idx", "dim")
  }

  /** Elementwise blended stat VIF + (1 - KS) (network_blended.py:78-81). */
  def blend(vif: DataFrame, ks: DataFrame): DataFrame =
    vif.join(ks, Seq("dim_i", "dim_j"))
      .select(col("dim_i"), col("dim_j"),
        round(col("vif") + (lit(1.0) - col("ks")), 6).as("blended"))

  /** Apply a dimension permutation to the vectors — `buddy_up`
    * (utils.py:195-202) as a pure projection; emitted long-form for
    * oracle-friendliness: (id, dim, value) where value = vec[perm[dim]]. */
  def buddyUpLong(points: DataFrame, perm: Seq[Int]): DataFrame =
    points.select(
      col("id"),
      posexplode(permute(col("vec"), perm)).as(Seq("dim", "v")))
      .select(col("id"), col("dim"), round(col("v").cast("double"), 6).as("value"))
}
