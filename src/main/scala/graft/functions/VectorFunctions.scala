package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen-capable higher-order functions (`zip_with`/`aggregate`) —
  * no UDFs, so these stay serializable plan fragments that Catalyst
  * can prune/push around, and execute per-row with zero shuffle.
  *
  * All arithmetic is done in Double after an explicit cast, folding
  * left-to-right in element order — the same evaluation order DuckDB's
  * `list_cosine_similarity` uses on `DOUBLE[]`, which is what lets
  * cosine scores hash-match the oracle bit-for-bit.
  */
object VectorFunctions {

  /** Cast a float vector to double for stable arithmetic — a native
    * element-wise Cast (codegen'd, yields primitive unsafe arrays),
    * not a per-element lambda. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Let-bind an expression so downstream lambdas reference it as a
    * lambda VARIABLE instead of re-evaluating the expression tree.
    * Interpreted higher-order functions re-evaluate any non-attribute
    * subexpression used inside a lambda once per element — nesting an
    * O(n) expression inside an O(n) lambda silently goes O(n²) per
    * row. `transform` over a one-element array evaluates `e` exactly
    * once and exposes it as a variable. */
  def bound(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity of two double vectors — the codegen'd
    * [[VectorKernels.CosineSim]] kernel (bit-identical fold order to
    * `dot(a,b) / (norm(a) * norm(b))`, ~50× faster than the
    * interpreted lambda trees). Requires the graft extensions on the
    * session. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)

  /** Hyperplane LSH band signatures (array<long>, index = band id,
    * value = packed plane-side bits) — the codegen'd
    * [[VectorKernels.HyperplaneBands]] kernel. Requires the graft
    * extensions on the session. */
  def hyperplane_bands(v: Column, bands: Int = VectorKernels.HpSigBands): Column =
    org.apache.spark.sql.functions.call_function(
      "graft_hyperplane_bands", v, lit(bands))
}
