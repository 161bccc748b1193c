package graft.tools

/** Print declared oracle SQL for the named queries (no SparkSession —
  * registry construction is plain Scala), so an oracle can be smoke-run
  * in DuckDB before paying a Spark verify cycle.
  * Usage: sbt "runMain graft.tools.OracleDump q_hll_merge ..."
  */
object OracleDump {
  def main(args: Array[String]): Unit =
    args.foreach { name =>
      val q = graft.Registry.byName(name)
      println(s"-- ==== $name ====")
      println(q.oracle.getOrElse("-- (no oracle)"))
      println(";")
    }
}
