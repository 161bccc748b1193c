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
}
