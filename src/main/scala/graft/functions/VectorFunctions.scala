package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embeddings — pure Spark
  * higher-order functions (zip_with/aggregate), so everything stays inside
  * WholeStageCodegen with no UDF boundary and no serialization.
  *
  * Floats are promoted to double BEFORE multiplication so accumulation
  * happens in f64 left-to-right — the same op sequence the DuckDB oracle
  * uses, keeping scores reproducible across engines (residual last-ulp
  * differences are absorbed by 6dp rounding at the output edge).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision — the native codegen'd
    * [[graft.functions.DotF32]] kernel (the HOF
    * `aggregate(zip_with(...))` form runs interpreted and was the
    * innermost cost of every vector operator).
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotF32.column(a, b)

  /** ‖a‖₂ in double precision. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two embedding columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (avoids recomputing ‖·‖ in joins —
    * precompute once per side before an all-pairs/bucketed join).
    */
  def cosinePre(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}
