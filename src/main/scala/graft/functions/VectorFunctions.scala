package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The engine's scalar vector-function library (SURVEY.md §2.2, F1–F17).
  *
  * All functions are pure `Column` compositions over `ARRAY<DOUBLE>` built
  * from `org.apache.spark.sql.functions` higher-order functions, so they stay
  * inside whole-stage codegen (no UDFs, no serialization boundary) and fold
  * left-to-right — the same evaluation order DuckDB's `list_reduce` uses,
  * which is what makes double-precision oracle parity possible.
  *
  * Semantics mirror the reference's `internal/math/distance.go`:
  *  - `cosineDistance` clamps similarity to [-1, 1] and returns 1.0 when
  *    either norm is zero (distance.go:55-71).
  *  - `innerProductDistance` is the *negative* dot product, so "dot" ranks
  *    by most-negative distance = largest dot (distance.go:91-93).
  */
object VectorFunctions {

  /** Cast an ARRAY<FLOAT>/ARRAY<numeric> column to ARRAY<DOUBLE>. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Σ aᵢ·bᵢ (distance.go:28-34). Native codegen'd loop (the
    * `aggregate(zip_with(...))` formulation is CodegenFallback —
    * interpreted and allocating — see org.apache.spark.sql.graftx.DistanceExpressions); fold
    * order is identical, so oracle parity is unchanged. */
  def dot(a: Column, b: Column): Column = org.apache.spark.sql.graftx.DistanceExpressions.dotFast(a, b)

  /** Σ (aᵢ−bᵢ)² — the internal comparator used by all k-means/PQ inner
    * loops (distance.go:18-25); monotone in L2, so rank by this and defer
    * sqrt to final projection (SURVEY.md §4 "skip sqrt in comparators"). */
  def l2Sq(a: Column, b: Column): Column = org.apache.spark.sql.graftx.DistanceExpressions.l2SqFast(a, b)

  /** √Σ(aᵢ−bᵢ)² (distance.go:8-15). */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Manhattan/L1 distance — native fused |aᵢ−bᵢ| fold. */
  def l1(a: Column, b: Column): Column = org.apache.spark.sql.graftx.DistanceExpressions.l1Fast(a, b)

  /** Squared L2 norm (distance.go:46-52). */
  def normSq(v: Column): Column = dot(v, v)

  /** L2 norm (distance.go:37-43). */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** ‖a−b‖² = ‖a‖²+‖b‖²−2⟨a,b⟩ given precomputed squared norms — the
    * join-friendly formulation (simd.go:180-198) used when norms are
    * materialized index columns. */
  def l2SqFromNorms(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    greatest(normSqA + normSqB - lit(2.0) * dotAb, lit(0.0))

  /** 1 − cos(a,b), clamped; zero-norm → 1.0 (distance.go:55-71). */
  def cosineDistance(a: Column, b: Column): Column =
    cosineDistanceWithNorms(dot(a, b), norm(a), norm(b))

  /** Cosine distance from precomputed dot and norms (distance.go:74-88) —
    * the reference's key flat-search optimization (flat.go:100). */
  def cosineDistanceWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    when(normA === 0.0 || normB === 0.0, lit(1.0))
      .otherwise(lit(1.0) - least(lit(1.0), greatest(lit(-1.0), dotAb / (normA * normB))))

  /** MIPS-as-min-distance: −⟨a,b⟩ (distance.go:91-93). */
  def innerProductDistance(a: Column, b: Column): Column = -dot(a, b)

  /** Element-wise arithmetic (vector.go:54-78). */
  def vecAdd(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
  def vecSub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)
  def vecScale(v: Column, s: Column): Column = transform(v, x => x * s)

  /** Scale to unit norm; no-op on the zero vector (vector.go:90-108). */
  def normalize(v: Column): Column = {
    val n = norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }

  /** similarity = 1 − distance (examples/.../main.go:236). */
  def similarity(distance: Column): Column = lit(1.0) - distance

  /** M·v via per-row dot products (simd.go:105-115): `matrix` is an
    * ARRAY<ARRAY<DOUBLE>> column (small, e.g. a PQ table), result is
    * ARRAY<DOUBLE> of row dots. */
  def matVec(matrix: Column, v: Column): Column =
    transform(matrix, row => dot(row, v))

  /** [[matVec]] against a CONSTANT matrix — one native kernel call
    * (graftx.MatVecExpr) instead of a higher-order `transform` whose
    * lambda dispatches interpreted per output element (dim interpreted
    * calls per row — the dominant cost of the OPQ encode pass, VERDICT
    * r12 next #7). Per-element fold order is exactly [[dot]]'s, so
    * values are bit-identical to the Column form. */
  def matVec(matrix: Seq[Seq[Double]], v: Column): Column =
    org.apache.spark.sql.graftx.DistanceExpressions.matVecFast(matrix, v)
}
