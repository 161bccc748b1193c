package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runs one declared query N times and prints each
  * wall time + the final executed plan. Usage:
  *   sbt "runMain graft.tools.TimeQuery q_knn_brute /root/testdata/sf0.1 3"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark) // uniform session surface (ADVICE r9)
    // SPARK_GRAFT_CACHE_TABLES=1 reproduces Bench's cached-table session
    // (plan shapes can differ: InMemoryRelation stats vs file stats)
    if (sys.env.get("SPARK_GRAFT_CACHE_TABLES").contains("1"))
      graft.Tables.names.foreach { n =>
        try graft.Tables(spark, dir, n).cache().count()
        catch { case _: Throwable => () }
      }
    val q = graft.Registry.byName(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = q.build(spark, dir).count()
      println(f"RUN$i%d: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      graft.Caches.releaseAll()
    }
    if (args.length > 3 && args(3) == "explain")
      q.build(spark, dir).explain("formatted")
    spark.stop()
  }
}
