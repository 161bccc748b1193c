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

  test("SCD2 streaming twin survives a cross-trigger user history that the session gap would have sealed early") {
    import spark.implicits._
    import graft.streaming.{PathEvent, Scd2, VersionRecord}
    // Hand-crafted fixture, one file per micro-batch:
    //   f0: A@t0 "view", B@t0+100min "click"  → watermark after f0 = t0+40min
    //   f1: C@t0+50min "view" (NO data for A — the trigger in which a
    //       30-min gap timeout would fire for A, since t0+40min > t0+30min;
    //       the 90-min SealGapUs must NOT fire: t0+40min < t0+90min)
    //   f2: A@t0+45min "purchase" (on time: ≥ watermark t0+40min) — under
    //       an early seal this would start a second, overlapping chain
    //   f3: far-future sentinel seals every chain exactly once
    val t0 = 1704067200L * 1000000L // 2024-01-01T00:00:00Z in µs
    val min = 60L * 1000000L
    val rows = Seq(
      Seq((1L, 1L, t0, "view"), (2L, 2L, t0 + 100 * min, "click")),
      Seq((3L, 3L, t0 + 50 * min, "view")),
      Seq((1L, 4L, t0 + 45 * min, "purchase")),
      Seq((-1L, -1L, t0 + 100 * min + 3L * 3600 * 1000000L, "view")))
    val staged = java.nio.file.Files.createTempDirectory("graft-scd2-mb").toString
    rows.zipWithIndex.foreach { case (batch, i) =>
      batch.toDF("user_id", "event_id", "ts_us", "event_type")
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"),
          timestamp_micros(col("ts_us")).as("ts"))
        .coalesce(1).write.parquet(s"$staged/f$i.parquet")
      // deterministic batch order: strictly increasing data-file mtimes
      import java.nio.file.{Files, Paths, FileVisitOption}
      import java.nio.file.attribute.FileTime
      Files.walk(Paths.get(s"$staged/f$i.parquet"), FileVisitOption.FOLLOW_LINKS)
        .filter(Files.isRegularFile(_))
        .forEach(p => Files.setLastModifiedTime(p,
          FileTime.fromMillis(1704067200000L + i * 60000L)))
    }
    val real = rows.flatten.filter(_._1 >= 0)
      .toDF("user_id", "event_id", "ts_us", "event_type")
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"),
        timestamp_micros(col("ts_us")).as("ts"))
    val batchWant = Scd2.versions(real.as[PathEvent])
      .collect().map(v => (v.user_id, v.event_type, v.start_us, v.end_us)).sorted
    // user A must have a closed "view" then an open "purchase" — the
    // exact shape an early seal corrupts into two overlapping chains
    assert(batchWant.filter(_._1 == 1L).toSeq ===
      Seq((1L, "purchase", t0 + 45 * min, -1L), (1L, "view", t0, t0 + 45 * min)))
    val schema = real.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$staged/*.parquet")
      .withWatermark("ts", "1 hour")
      .as[PathEvent]
    val q = Scd2.versionsStream(stream).writeStream
      .format("memory").queryName("scd2_mb").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("scd2_mb").as[VersionRecord]
      .collect().filter(_.user_id >= 0)
      .map(v => (v.user_id, v.event_type, v.start_us, v.end_us)).sorted
    assert(streamed.toSeq === batchWant.toSeq)
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

  test("streaming HLL store append across micro-batches == batch day-2 " +
    "fold, and a redelivered batch is a fold no-op (at-least-once is free)") {
    import graft.streaming.Streams
    // spec-private store: base registers (orders ≡ 2..9 mod 10)
    val key = System.nanoTime().toString
    val t = s"g_stream_hll_$key"
    val wh = java.nio.file.Files.createTempDirectory("graft-stream-hll").toString
    val o = Tables(spark, dir, "orders")
    def regsOf(filter: org.apache.spark.sql.Column) =
      graft.streaming.Streams.hllRegistersStream(
        o.filter(filter).select(col("o_custkey").as("k")))
    regsOf(col("o_orderkey") % 10 >= 2)
      .select(col("j"), col("m"), lit("base").as("vintage"))
      .write.mode("overwrite").partitionBy("vintage")
      .option("path", s"$wh/regs").saveAsTable(t)
    // the delta (≡ 1) streams in as 3 micro-batches of raw keys
    val deltaKeys = o.filter(col("o_orderkey") % 10 === 1)
      .select(col("o_custkey").as("k"))
    val staged = s"$wh/staged"
    val rows = deltaKeys.collect()
    rows.grouped(rows.length / 3 + 1).zipWithIndex.foreach { case (part, i) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(part.toIndexedSeq, 1), deltaKeys.schema)
        .write.parquet(s"$staged/batch$i.parquet")
    }
    val q = spark.readStream.schema(deltaKeys.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$staged/*.parquet")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        Streams.appendHllRegistersBatch(df, t)
      }
      .option("checkpointLocation", s"$wh/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    def fold(): Seq[(Int, Int)] =
      spark.table(t).groupBy(col("j")).agg(max(col("m")).as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    val streamed = fold()
    val expected = regsOf(col("o_orderkey") % 10 =!= 0)
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(streamed === expected,
      "streamed per-batch appends must fold to the batch day-2 registers")
    // at-least-once: redeliver the first micro-batch — rows re-append,
    // the fold must not move (register algebra, not dedup machinery)
    val grown = spark.table(t).count()
    Streams.appendHllRegistersBatch(
      spark.read.parquet(s"$staged/batch0.parquet"), t)
    assert(spark.table(t).count() > grown,
      "the redelivered batch must actually re-append rows")
    assert(fold() === expected,
      "a redelivered batch changed the served fold")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    def rmr(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rmr); f.delete(); ()
    }
    rmr(new java.io.File(wh))
  }
}
