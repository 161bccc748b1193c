package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Column wrappers for the membership-probe expressions. */
object Probes {

  /** Codegen'd Bloom-filter membership probe: `bloomProbe(col, bf)` is the
    * native replacement for `udf(bf.mightContain _)` — same semantics
    * (false positives possible, false negatives never), but the probe
    * stays inside whole-stage codegen on the scan it is meant to
    * accelerate.
    */
  def bloomProbe(key: Column, filter: BloomFilter): Column =
    Bridge.column(graft.plans.BloomProbe(Bridge.expression(key), filter))
}
