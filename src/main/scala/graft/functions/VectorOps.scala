package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` columns.
  *
  * Built entirely from Spark's codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDFs, so the whole expression stays inside
  * whole-stage codegen and never deserializes the array to JVM objects.
  * Accumulation is a left fold in index order with a double accumulator,
  * matching DuckDB's list functions closely enough that ROUND(x, 4) is
  * bit-stable across engines.
  *
  * At 100 TB scale these are per-row scalar expressions: they parallelize
  * with the scan and add no shuffle.
  */
object VectorOps {
  import org.apache.spark.sql.graft.Bridge

  /** Dot product of two numeric arrays (double accumulation, index order).
    * HOF form: interpreted, kept for generic element types and as the
    * reference implementation the codegen'd expressions are tested against.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1] over array<float|double> columns (mixed
    * element types allowed; floats widen to double exactly like the HOF
    * cast) — the native codegen'd expression (graft.plans.CosineSimilarity);
    * bit-identical to cosineHof but runs inside whole-stage codegen.
    */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(graft.plans.CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  /** Interpreted HOF cosine (reference implementation for tests). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** dot(a, constant signs vector) — codegen'd, for LSH bucket bits. */
  def signedDot(a: Column, signs: Array[Double]): Column =
    Bridge.column(graft.plans.SignedDot(
      Bridge.expression(a), signs))

  /** Sum of the array's elements as double. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double"))
}
