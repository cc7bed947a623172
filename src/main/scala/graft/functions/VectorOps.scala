package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns using Spark's
  * higher-order functions (`zip_with` + `aggregate`): no UDF, no
  * deserialization to Scala objects, and — critically for oracle
  * parity — a *defined* accumulation order (left-to-right in index
  * order, double precision). DuckDB mirrors it with
  * `list_sum(list_transform(...))`; its own `list_cosine_similarity`
  * accumulates in float32 and is NOT reproducible, so we avoid it on
  * both sides.
  */
object VectorOps {

  import org.apache.spark.sql.graft.bridge

  /** Σ aᵢ·bᵢ, left-to-right, double — the codegen'd
    * [[graft.plans.VecDot]] expression (same value as the
    * `aggregate(zip_with(...))` formulation, ~10× faster: higher-order
    * functions are CodegenFallback and interpret per row).
    */
  def dot(a: Column, b: Column): Column =
    bridge.column(graft.plans.VecDot(bridge.expression(a), bridge.expression(b)))

  /** Reference formulation via higher-order functions (kept for
    * cross-checking VecDot in tests).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Σ aᵢ², left-to-right, double. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity `dot / sqrt(|a|²·|b|²)` — single sqrt so both
    * engines compute the identical IEEE expression tree.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))
}
