package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` of the named queries to
  * <outDir>/<query>_<tag>.txt — the per-change plan evidence the
  * optimization rounds commit under plans/r16/. Usage:
  *   sbt "runMain graft.tools.ExplainSome <sfDir> <outDir> <tag> q_a q_b ..."
  * Runs each query once first so the dumped plan is the AQE-final one.
  */
object ExplainSome {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val ids = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark)
    graft.Tables.names.foreach { n =>
      try graft.Tables(spark, dir, n).cache().count()
      catch { case _: Throwable => () }
    }
    Files.createDirectories(Paths.get(outDir))
    ids.foreach { id =>
      val q = graft.Registry.byName(id)
      val df = q.build(spark, dir)
      try { df.count(); () } catch { case _: Throwable => () } // AQE-final
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${id}_$tag.txt"), txt)
      println(s"WROTE $outDir/${id}_$tag.txt")
      graft.Caches.releaseAll()
    }
    spark.stop()
  }
}
