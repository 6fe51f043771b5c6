package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge => B}
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns. The dot
  * product is a native codegen'd Catalyst expression
  * ([[DotProduct]]) — a tight primitive loop, no UDF/serialization
  * cost and no intermediate array — and its left-to-right accumulation
  * order is deterministic, which keeps doubles bitwise-comparable with
  * the DuckDB oracle's sequential `list_dot_product`.
  */
object VectorFunctions {

  /** Cast to array<double> so all arithmetic runs in double precision
    * (float intermediates would drift from the oracle). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential dot product (native codegen expression). */
  def dot(a: Column, b: Column): Column =
    B.column(DotProduct(B.expression(a), B.expression(b)))

  /** L2 norm — deliberately NON-NULLABLE (null vector → 0.0, which
    * downstream try_divide turns into the same null cosine a null
    * norm would). Nullability here is a plan-shape issue, not a
    * semantics one: a nullable norm column referenced in a join/filter
    * condition makes InferFiltersFromConstraints add an
    * `isnotnull(nrm)` predicate, and predicate pushdown then expands
    * the norm's ENTIRE defining expression into a pre-projection
    * filter — for the quantized search path that re-computed the full
    * quantize→dequantize→norm chain once per row just to null-check
    * it (measured ~2× on E4). A non-nullable column generates no
    * isnotnull constraint at all. */
  def l2(v: Column): Column = coalesce(sqrt(dot(v, v)), lit(0.0d))

  /** Cosine similarity of two double arrays. NULL (not an error) for
    * a zero-norm vector: Spark 4 runs ANSI mode by default, where a
    * plain /0.0 throws and one degenerate all-zero embedding would
    * kill the whole job. try_divide (NOT nullif) is the guard:
    * nullif(x, 0) expands to If(x = 0, null, x), duplicating the
    * denominator subtree — measured 30× on the IVF path, where the
    * doubled per-centroid expression blew whole-stage codegen into
    * interpreted fallback. try_divide evaluates each operand once. */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), l2(a) * l2(b))

  /** Cosine given precomputed norms (avoids recomputing the norm of
    * the same vector against every candidate — at n·k comparisons the
    * norm is computed once per row, not once per pair). Zero-norm
    * guarded like [[cosine]]. */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    try_divide(dotAB, normA * normB)

  /** Per-vector symmetric int8 scalar quantization: each component
    * maps to round(x / scale) with scale = max|x| / 127, stored as
    * `(scale float, q array<tinyint>)` — 4× smaller than float32 and
    * 8× smaller than the double form, the difference between a 100 TB
    * and a 25 TB embedding store. Per-vector scaling (vs corpus-wide)
    * needs no global statistics pass and bounds the per-component
    * error at scale/2 regardless of outlier vectors elsewhere.
    * Zero vectors get scale 0 and all-zero codes.
    *
    * Codes are computed against the FLOAT-rounded scale — the exact
    * value dequantization will multiply by — so the scale/2 error
    * bound genuinely holds; rounding against the double scale while
    * reconstructing with the float one leaks up to 127·ulp extra
    * error, enough to breach the bound. Codes are clamped to ±127
    * because float-rounding the scale down can push max|x|/scale a
    * hair past 127 (which an ANSI byte cast would turn into a crash).
    *
    * Prefer the two-argument form with [[int8Scale]] computed in its
    * OWN projection: the inlined one-argument form substitutes the
    * max|x| aggregate into the per-element transform lambda
    * (higher-order lambdas are interpreted and not
    * subexpression-eliminated), making each row O(d²). With the scale
    * staged as a column, the lambda references a per-row attribute —
    * evaluated once per row — and CollapseProject will not re-inline
    * it (it refuses to duplicate non-cheap expressions used more than
    * once).
    */
  def quantizeInt8(v: Column): Column = quantizeInt8(v, int8Scale(v))

  /** The per-vector quantization scale, float-rounded: max|x| / 127.
    * Compute this in a separate projection and pass it to
    * [[quantizeInt8]](v, scale) so the aggregate runs once per row. */
  def int8Scale(v: Column): Column =
    (aggregate(v, lit(0.0d), (acc, x) => greatest(acc, abs(x)))
      / lit(127.0d)).cast("float")

  /** [[quantizeInt8]] with a precomputed [[int8Scale]] column. */
  def quantizeInt8(v: Column, scaleF: Column): Column = {
    // float-rounded scale: quantize and dequantize share this value
    val scale = scaleF.cast("float").cast("double")
    struct(
      scale.cast("float").as("scale"),
      when(scale === 0.0d, transform(v, _ => lit(0).cast("byte")))
        .otherwise(transform(v, x =>
          least(greatest(round(x / scale, 0), lit(-127.0d)), lit(127.0d))
            .cast("int").cast("byte"))).as("q"))
  }

  /** Reconstruct an approximate double vector from [[quantizeInt8]]
    * output. */
  def dequantizeInt8(qv: Column): Column =
    transform(qv.getField("q"),
      q => q.cast("double") * qv.getField("scale").cast("double"))
}
