package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-query cost anatomy for the optimization rounds (guide §1): where
  * does a timed pass's wall clock go? Splits one execution into
  *   - build_ms: driver-side DataFrame construction (includes any eager
  *     jobs the query's build step runs — store builds, materialize
  *     counts);
  *   - plan_ms: analysis + optimization + physical planning of the final
  *     action, from the QueryPlanningTracker;
  *   - exec_ms: the count() action itself;
  *   - jobs / stages / tasks: scheduler work the action generated;
  *   - task_ms: summed executor task time (run time, not queue time);
  *   - shuffle_w/r: bytes through exchanges.
  * exec_ms ≫ task_ms/cores with small task counts = per-stage scheduling
  * latency (sequential stage chains); task_ms ≈ exec_ms × cores = real
  * compute. Usage:
  *   sbt "runMain graft.tools.ProfileQueries /root/testdata/sf0.1 q_a q_b"
  * Reports the SECOND run of each query (warm caches, JIT done), matching
  * Bench's steady-state protocol.
  */
object ProfileQueries {
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
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    val shufR = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
        ()
      }
    })
    def resetCounters(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); shufW.set(0); shufR.set(0)
    }
    ids.foreach { id =>
      val q = graft.Registry.byName(id)
      // pass 1: warm-up (JIT, codegen, footer caches), untimed
      try { q.build(spark, dir).count(); () }
      catch { case e: Throwable => System.err.println(s"[profile] $id warm-up: ${e.getMessage}") }
      graft.Caches.releaseAll()
      Thread.sleep(300) // let the async listener bus drain the warm-up's events
      resetCounters()
      val t0 = System.nanoTime()
      val df = q.build(spark, dir)
      val tBuild = System.nanoTime()
      df.count()
      val tExec = System.nanoTime()
      Thread.sleep(500) // listener bus settle
      val tr = df.queryExecution.tracker
      val phases = tr.phases.map { case (k, v) => s""""$k":${v.durationMs}""" }
        .mkString("{", ",", "}")
      println(s"""{"id":"$id","build_ms":${(tBuild - t0) / 1000000},""" +
        s""""exec_ms":${(tExec - tBuild) / 1000000},"phases":$phases,""" +
        s""""jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},""" +
        s""""task_ms":${taskMs.get},"shuffle_w":${shufW.get},"shuffle_r":${shufR.get}}""")
      graft.Caches.releaseAll()
    }
    spark.stop()
  }
}
