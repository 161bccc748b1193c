package graft

import graft.streaming.{SessionEvent, Sessions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch streaming regression: the sessionizer must survive several
  * micro-batches with an advancing watermark (the timeout-clamp path) and
  * must not emit duplicate session keys across seals.
  */
class StreamingMultiBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("stateful sessionizer across multiple micro-batches") {
    import spark.implicits._
    // split events into 3 chronological files so the file source feeds
    // them as separate micro-batches (test-only staging of the testdata)
    val staged = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ev = Tables.events(spark, dir).orderBy("ts")
    val n = ev.count()
    val parts = ev.collect().grouped((n / 3 + 1).toInt).toSeq
    parts.zipWithIndex.foreach { case (rows, i) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), ev.schema)
        .write.parquet(s"$staged/batch$i.parquet")
    }
    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$staged/*.parquet")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"), col("ts"))
      .as[SessionEvent]
    val q = Sessions.sessionizeStream(stream).writeStream
      .format("memory").queryName("sess_mb").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("sess_mb")
    assert(out.count() > 0)
    // no duplicate (user, session-start) keys across seals
    assert(out.groupBy("user_id", "start_us").count()
      .filter(col("count") > 1).count() === 0)
    // sealed sessions respect the 30-minute gap invariant internally
    assert(out.filter(col("end_us") - col("start_us") < 0).count() === 0)
  }

  test("Jobs.await propagates the body's failure") {
    val handle = graft.jobs.Jobs.start(spark, "failing-job") {
      Tables(spark, "/nonexistent", "lineitem").count()
    }
    val thrown = intercept[Exception] { handle.await() }
    assert(thrown.getMessage.contains("nonexistent") ||
      thrown.getCause != null)
    handle.close()
  }
}
