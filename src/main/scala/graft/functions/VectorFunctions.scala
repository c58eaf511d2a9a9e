package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType/DoubleType)` embedding columns,
  * built entirely from codegen'd higher-order functions (`zip_with`,
  * `aggregate`) — no UDF serialization, stays inside whole-stage codegen.
  *
  * Folds are sequential left-to-right, which keeps results bit-identical
  * across engines that fold the same way (the DuckDB oracle's
  * `list_dot_product` included) — important for hash-parity checks.
  */
object VectorFunctions {

  /** Cast an embedding column to Array[Double] for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Native primitive-loop dot product (VecDot); same sequential fold as the
    * higher-order formulation, ~20× faster on all-pairs workloads. */
  def dot(a: Column, b: Column): Column = VecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** All-pairs usage note: precompute `norm(v)` as its OWN projected column
    * and write cosine as `dot(a,b)/(nrmA*nrmB)` — that moves the two norm
    * folds out of the O(n²) pair loop into the O(n) scan while keeping the
    * formula (and its rounding) identical to the oracle's. Don't normalize
    * inside `transform` — an outer aggregate embedded in a lambda re-evals
    * per element. */

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Sign-random-projection bit code (LSH for cosine): `bits` hyperplanes
    * with ±1 coefficients derived deterministically from xxhash64 of
    * (plane, dim). Returns an integer bucket code in [0, 2^bits).
    *
    * The planes are pseudo-random but seed-stable, so the same code works
    * across runs/executors with zero broadcast state — at 100 TB the bucket
    * assignment is a pure map-side expression.
    */
  def srpCode(v: Column, bits: Int, seed: Int = 0): Column =
    SrpCode(v, bits, seed)
}
