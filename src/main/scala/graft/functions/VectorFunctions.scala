package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar functions over `ArrayType(FloatType)` columns.
  *
  * Replaces the reference's NumPy kernels: `np.linalg.norm(a-b)`
  * (/root/reference/src/algorithms/sharding/clustering/shard.py:127, and
  * `pdist` in kanndi/shard_by_distance.py:68) and the normalized-dot cosine
  * similarity (/root/reference/src/util/utils.py:216-235).
  *
  * All arithmetic is forced to Double before any op so results are
  * bit-identical with the DuckDB oracle (float32 parquet values cast to
  * float64 exactly; subsequent double ops are IEEE-deterministic). Built on
  * higher-order functions so the whole expression stays inside whole-stage
  * codegen — no UDF serialization boundary.
  */
object VectorFunctions {

  /** Elementwise cast to double; exact for float32 inputs. */
  def vecD(v: Column): Column = transform(v, _.cast("double"))

  /** Half-up rounding via floor(x*10^d + 0.5)/10^d. Unlike `round`, this is
    * a pure double computation, so two engines holding the same double
    * always agree — `round` differs cross-engine when a composite of
    * already-rounded ratios lands exactly on a .5 decimal boundary (Java
    * rounds the shortest decimal repr, DuckDB the binary value). Use for
    * ratio-valued outputs (jaccard, rates, scores). */
  def roundHU(c: Column, d: Int): Column = {
    val p = math.pow(10, d)
    floor(c * p + lit(0.5)) / lit(p)
  }

  /** Squared L2 distance: fold of (a_i - b_i)^2 in array order. Backed by
    * the codegen'd native expression; identical double semantics to the
    * HOF form (see [[graft.functions.VectorExpressions]] and
    * [[l2SqHof]]). */
  def l2Sq(a: Column, b: Column): Column = VectorExpressions.l2Sq(a, b)

  /** Interpreted HOF form of l2Sq — kept as the semantic reference the
    * native expression is tested against. */
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 (Euclidean) distance. */
  def l2Dist(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Dot product in double precision (codegen'd native expression). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Interpreted HOF form of dot — semantic reference for tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity dot/(|a||b|) (utils.py:216-235 semantics). */
  def cosineSim(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine distance 1 - cosine similarity. */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosineSim(a, b)

  /** L2-normalize, rounding each component to 10 dp
    * (reference `to_solr_vector` normalization, utils.py:67-68). */
  def normalize(v: Column, decimals: Int = 10): Column = {
    val n = norm2(v)
    transform(v, x => round(x.cast("double") / n, decimals))
  }

  /** Reorder vector dimensions by a 0-based permutation array — the
    * reference's `buddy_up` (utils.py:195-202): `points[:, friends]`. */
  def permute(v: Column, perm: Seq[Int]): Column =
    transform(
      array(perm.map(lit): _*),
      i => element_at(v, i + 1))

  /** Solr-style vector string "1|v1 2|v2 ..." (utils.py:37-49; 1-based). */
  def toSolrVector(v: Column): Column =
    array_join(
      zip_with(
        sequence(lit(1), size(v)),
        v,
        (i, x) => concat(i.cast("string"), lit("|"), x.cast("string"))),
      " ")

  /** CSV vector string (utils.py:26-34). */
  def toCsvVector(v: Column): Column = array_join(v, ",")

  /** Deterministic random-projection dimensionality reduction:
    * out[k] = sum_i vec[i] * R(k,i) with integer weights
    * R(k,i) = ((k*31 + i*7) % 13) - 6 — the dense-projection twin of the
    * SRP-LSH bucketer ([[graft.operators.Dedup.srpBucket]]): identical
    * doubles on every engine, a pure map stage at any scale. */
  def randomProjection(vec: Column, outDim: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(outDim - 1)), k =>
      aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (v, i) => v.cast("double") * ((k * 31 + i * 7) % 13 - 6).cast("double")),
        lit(0.0), (acc, v) => acc + v))
}
