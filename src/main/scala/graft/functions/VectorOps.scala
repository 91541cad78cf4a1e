package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense-vector column math over `ArrayType(FloatType)` embeddings, built
  * entirely from codegen'd higher-order functions (`zip_with`/`aggregate`/
  * `transform`) — no UDFs, so Catalyst folds and pipelines them.
  *
  * All math is done in double precision left-to-right, which matches how
  * DuckDB's `list_cosine_similarity` computes over `DOUBLE[]` — keeps the
  * differential oracle bit-stable.
  */
object VectorOps {

  /** element-wise cast to double */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Σ aᵢ·bᵢ, sequential double accumulation */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** cosine similarity; NULL-safe on zero-norm vectors (→ NULL, not ÷0).
    * Composed-builtins reference form; [[cosineNative]] is the codegen'd
    * equivalent used on hot paths.
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(null).cast(DoubleType)).otherwise(d / nn)
  }

  /** cosine via the native [[graft.expressions.CosineSim]] expression —
    * identical math, whole-stage-codegen'd loop. Resolved through the
    * `graft_cosine` SQL function that [[graft.GraftExtensions]] registers
    * (every [[graft.GraftSession]] session has it).
    */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)
}
