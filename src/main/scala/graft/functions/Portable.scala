package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{conv, floor, lit, md5, substring}

/** Cross-engine deterministic primitives.
  *
  * Spark's `round(x, n)` rounds the double's shortest decimal string
  * (BigDecimal.valueOf + HALF_UP); DuckDB rounds the true binary value —
  * on knife-edge values (e.g. the double just below 0.31575) they disagree.
  * `pround` instead composes floor/multiply/add, which are bit-identical
  * IEEE-754 ops in every engine: FLOOR(x * 10^n + 0.5) / 10^n. Every
  * declared query uses this on both the Spark and the oracle side.
  */
object Portable {
  def pround(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** Canonical portable 60-bit hash (determinism rule 5): the first 15
    * hex chars of md5 parsed as a non-negative long. DuckDB equivalent:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. The width-15 prefix
    * is parity-critical — keep this the only definition.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Fixed-point CSV serialization of a numeric array: each element as
    * FLOOR(x·10ⁿ+0.5) rendered as an integer string, joined with ','.
    * The only portable way to emit float arrays as output columns —
    * float→string formatting differs across engines, integer→string
    * does not, and the downstream checker cannot sort raw arrays
    * (FIXTURES.md). DuckDB equivalent:
    * `array_to_string(list_transform(CAST(a AS DOUBLE[]),
    *    x -> CAST(CAST(FLOOR(x * 10^n + 0.5) AS BIGINT) AS VARCHAR)), ',')`.
    * The rounding form is parity-critical — keep this the only definition.
    */
  def pcsv(arr: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    org.apache.spark.sql.functions.concat_ws(",",
      org.apache.spark.sql.functions.transform(arr, x =>
        floor(x.cast("double") * lit(f) + lit(0.5)).cast("string")))
  }
}
