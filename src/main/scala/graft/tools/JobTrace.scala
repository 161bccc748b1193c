package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job trace of one query's steady-state execution: job id, wall ms,
  * and the job's call site / description — shows exactly where a
  * 30-job query spends its scheduling floor. Usage:
  *   sbt "runMain graft.tools.JobTrace /root/testdata/sf0.1 q_kcore"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val ids = args.tail.toSeq
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
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    graft.Tables.names.foreach { n =>
      try graft.Tables(spark, dir, n).cache().count()
      catch { case _: Throwable => () }
    }
    val starts = TrieMap[Int, (Long, String)]()
    @volatile var trace = List.empty[(Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, site) =>
          trace ::= ((j.jobId, (System.nanoTime() - t0) / 1000000, site))
        }
    })
    ids.foreach { id =>
      val q = graft.Registry.byName(id)
      try { q.build(spark, dir).count(); () }
      catch { case e: Throwable => System.err.println(s"[trace] $id warm-up: ${e.getMessage}") }
      graft.Caches.releaseAll()
      Thread.sleep(300)
      trace = Nil
      val t0 = System.nanoTime()
      q.build(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1000000
      Thread.sleep(500)
      println(s"== $id wall=${wall}ms jobs=${trace.size}")
      trace.sortBy(_._1).foreach { case (jid, ms, site) =>
        println(f"  job $jid%4d $ms%6d ms  $site")
      }
      graft.Caches.releaseAll()
    }
    spark.stop()
  }
}
