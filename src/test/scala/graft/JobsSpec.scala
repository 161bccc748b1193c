package graft

import graft.jobs.Jobs
import graft.mapreduce.MapReduce
import graft.sources.InMemory
import org.scalatest.funsuite.AnyFunSuite

/** Job-lifecycle parity (reference O7-O9): async start, progress polling,
  * wait, close — the shape of the reference's own demo driver
  * (SampleClient.cpp:83-99 polls getJobState while the job runs).
  */
class JobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("async start + progress polling + await (SampleClient driver shape)") {
    import spark.implicits._
    // Reference demo slows map with usleep to make progress observable
    // (SampleClient.cpp:47); we do the same with a per-partition sleep.
    val input = InMemory.inputValues(spark, (1 to 64).map(i => s"doc$i aa bb cc"))
      .repartition(8)
    val handle = Jobs.start(spark, "char-count") {
      MapReduce.mapReduce(input) { s =>
        Thread.sleep(150)
        s.iterator.filter(_ != ' ').map(c => (c.toString, 1L))
      } { (ch, vs) => Iterator.single((ch, vs.sum)) }.collect()
    }
    val observed = scala.collection.mutable.ArrayBuffer[jobs.JobState]()
    while (!handle.isCompleted) {
      observed += handle.state
      Thread.sleep(30)
    }
    val result = handle.await()
    assert(handle.state === jobs.JobState("REDUCE", 1.0))
    handle.close()
    // result correctness (same as synchronous run)
    val expected = (1 to 64).flatMap(i => s"doc$i aa bb cc".filter(_ != ' '))
      .groupBy(_.toString).view.mapValues(_.size.toLong).toMap
    assert(result.toMap === expected)
    // progress was observable while running and stayed in [0, 1]
    assert(observed.nonEmpty)
    assert(observed.forall(s => s.percentage >= 0.0 && s.percentage <= 1.0))
    val stagesSeen = observed.map(_.stage).distinct
    assert(stagesSeen.forall(Set("UNDEFINED", "MAP", "SHUFFLE", "REDUCE")))
  }

  test("outputVec round-trips inputVec through the facade") {
    import spark.implicits._
    val in = InMemory.inputVec(spark, Seq(("k1", 1), ("k2", 2), ("k1", 3)))
    val out = InMemory.outputVec(
      MapReduce.mapReduce(in)(Iterator.single(_)) { (k, vs) =>
        Iterator.single((k, vs.sum))
      }).sortBy(_._1)
    assert(out === Seq(("k1", 4), ("k2", 2)))
  }
}
