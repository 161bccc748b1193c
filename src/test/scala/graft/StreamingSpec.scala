package graft

import graft.streaming.{SessionEvent, Sessions, Streams}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming demos (test-only — DuckDB can't oracle a stream;
  * SURVEY.md §2.3 note): the streaming twins must agree with their
  * batch-checked counterparts on bounded input.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("streaming tumbling window == batch q_time_window counts") {
    val stream = Streams.tumblingCounts(Streams.eventsStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("win").agg(sum("cnt")).collect()(0).getLong(0)
    val want = Tables.events(spark, dir).count()
    assert(got === want)
    val batch = Registry.byName("q_time_window").build(spark, dir).count()
    assert(spark.table("win").count() === batch)
  }

  test("streaming dedup-by-key emits each event_id once") {
    val stream = Streams.dedupByKey(Streams.eventsStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dedup").count()
    val want = Tables.events(spark, dir).select("event_id").distinct().count()
    assert(got === want)
  }

  test("stateful sessionizer (batch mode) == declarative q_sessionize") {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"), col("ts"))
      .as[SessionEvent]
    val got = Sessions.sessionize(ev)
    val want = Registry.byName("q_sessionize").build(spark, dir)
    assert(got.count() === want.count())
    // per-user session counts must match exactly
    val gotPer = got.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    val wantPer = want.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(gotPer === wantPer)
  }

  test("stateful sessionizer (streaming mode) runs and seals sessions") {
    import spark.implicits._
    val ev = Streams.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"), col("ts"))
      .as[SessionEvent]
    val q = Sessions.sessionizeStream(ev).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // bounded input: sessions whose close precedes the final watermark seal.
    assert(spark.table("sess").count() > 0)
  }
}
