package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Stage-metric meter: runs an action under a [[SparkListener]] and
  * returns the total shuffle bytes it wrote and read (VERDICT r15 task
  * 2). This turns "the twin's 100 TB case is shuffle BYTES" from prose
  * into a pinned number — an approximate twin whose oracle passes but
  * whose plan still moves the full data mass (the reverted first
  * q_jaccard_approx design, and the reverted capped-LPA twin) now fails
  * a byte assertion instead of surviving until a bench window exposes
  * it.
  *
  * Mechanics: stage task metrics are aggregated driver-side and
  * delivered on `onStageCompleted`; the listener bus is ASYNC, so after
  * the action returns the meter polls until every submitted stage has
  * completed and the readings hold still for two consecutive polls
  * (bounded at 10 s — a metrics delivery failure must not hang a spec).
  * Skipped stages (shuffle reuse) never submit, so reuse of a prior
  * stage's shuffle output is counted zero — which is the honest
  * accounting for "bytes this query moved".
  *
  * Caveat: per-session global — measure queries SERIALLY on an
  * otherwise-idle session (the spec and the ShuffleCompare tool both
  * do); concurrent jobs would pollute the reading.
  */
object ShuffleMeter {

  final case class Reading(
      shuffleWriteBytes: Long,
      shuffleReadBytes: Long,
      stagesCompleted: Int)

  def measure[A](spark: SparkSession)(body: => A): (A, Reading) = {
    val write = new AtomicLong(0L)
    val read = new AtomicLong(0L)
    val submitted = new AtomicInteger(0)
    val completed = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        submitted.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
        completed.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = body
      // settle the async bus: submitted == completed AND stable twice
      var last = (-1, -1L, -1L)
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(50)
        val now = (completed.get, write.get, read.get)
        if (now == last && completed.get >= submitted.get) stable += 1
        else stable = 0
        last = now
      }
      (a, Reading(write.get, read.get, completed.get))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Measure one declared query by id: build, run (count), meter. */
  def measureQuery(spark: SparkSession, id: String, dir: String)
      : (Long, Reading) = {
    val q = graft.Registry.byName(id)
    val (rows, r) = measure(spark) { q.build(spark, dir).count() }
    graft.Caches.releaseAll()
    (rows, r)
  }
}

/** Side-by-side shuffle-byte comparison of declared query ids — the
  * SCALE.md measurement arm of the ShuffleMeter spec. Usage:
  *   sbt "runMain graft.tools.ShuffleCompare q_jaccard_approx q_graph_jaccard /root/testdata/sf0.1"
  * Prints one JSON line per id: rows, shuffle write/read bytes, stages.
  */
object ShuffleCompare {
  def main(args: Array[String]): Unit = {
    val ids = args.dropRight(1).toSeq
    val dir = args.last
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
    graft.plans.GraftExtensions.register(spark)
    ids.foreach { id =>
      // one untimed warm-up narrows the reading to steady-state (store
      // builds and their one-time shuffles land outside the metered run,
      // matching how Bench and SCALE.md time these ids)
      try { graft.Registry.byName(id).build(spark, dir).count(); () }
      catch { case e: Throwable => System.err.println(s"[shuffle] $id warm-up: ${e.getMessage}") }
      graft.Caches.releaseAll()
      val (rows, r) = ShuffleMeter.measureQuery(spark, id, dir)
      println(s"""{"id":"$id","rows":$rows,"shuffle_write_bytes":${r.shuffleWriteBytes},""" +
        s""""shuffle_read_bytes":${r.shuffleReadBytes},"stages":${r.stagesCompleted}}""")
    }
    spark.stop()
  }
}
