package graft

import org.scalatest.funsuite.AnyFunSuite

/** The BASELINE.md load-marker adjudication as executable checks — the
  * protocol a future judge applies to BENCH_r{N}.json markers is ONE
  * function here, not prose to re-derive.
  */
class CalibrationSpec extends AnyFunSuite {

  test("quiet markers mean no tax (clamped at 1.0, never a speedup credit)") {
    assert(Calibration.taxFactor(500, 500) === 1.0)
    assert(Calibration.taxFactor(450, 460) === 1.0)
    assert(Calibration.taxFactor(0, 0) === 1.0)
  }

  test("the round-8 markers reproduce the round-8 verdict's adjudication") {
    // BENCH_r08: calib 669/622 ms, total 118.155 s / 211 queries. The
    // verdict read this as a ~1.2-1.3x ambient tax and ~92-95 s
    // quiet-equivalent (~0.45 s/q); the executable protocol must land in
    // the same band.
    val tax = Calibration.taxFactor(669, 622)
    assert(tax > 1.2 && tax < 1.35, s"tax=$tax")
    val adj = Calibration.adjustedTotal(118.155, 669, 622)
    assert(adj > 88.0 && adj < 96.0, s"adjusted=$adj")
    val m = Calibration.Markers(669, 622, 4.41, 4.91, 118.155, 211)
    assert(m.adjustedSecPerQuery > 0.41 && m.adjustedSecPerQuery < 0.46)
    val (lo, hi) = m.taxBounds
    assert(lo < tax && tax < hi)
    assert(lo > 1.1 && hi < 1.45, s"bounds=($lo,$hi)")
  }

  test("adjusted never exceeds raw and scales linearly with the markers") {
    for (c <- Seq(460L, 500L, 650L, 1000L, 2000L)) {
      val adj = Calibration.adjustedTotal(100.0, c, c)
      assert(adj <= 100.0 + 1e-9)
      if (c >= 500L) assert(math.abs(adj - 100.0 * 500.0 / c) < 1e-9)
    }
  }

  test("parseSidecar reads the repo's real bench sidecar") {
    val path = java.nio.file.Paths.get("bench_per_query.json")
    assume(java.nio.file.Files.exists(path))
    val m = Calibration.parseSidecar(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
    assert(m.calibBeforeMs > 0 && m.calibAfterMs > 0)
    assert(m.totalSec > 0 && m.nQueries > 100)
    assert(m.tax >= 1.0)
    assert(m.adjustedTotalSec <= m.totalSec + 1e-9)
    assert(m.rawSecPerQuery >= m.adjustedSecPerQuery)
  }

  test("parseSidecar fails loudly on a sidecar missing markers") {
    intercept[IllegalArgumentException] {
      Calibration.parseSidecar("""{"total": 5.0, "queries": {}}""")
    }
  }

  test("r10 telemetry sidecar: scalars anchored before queries, nQ not " +
    "tripled by gc_ms/cpu_ms, per-query metrics parse") {
    val json = """{"sf":"/x","unit":"sec","total":3.5,
      "calib_before_ms":510,"calib_after_ms":530,"quiet_ms":500.0,
      "loadavg_before":4.0,"loadavg_after":4.2,"tax_factor":1.040,
      "queries":{"q_a_one":1.5,"q_b_two":2.0},
      "gc_ms":{"q_a_one":120,"q_b_two":7},
      "cpu_ms":{"q_a_one":4400,"q_b_two":900}}"""
    val m = Calibration.parseSidecar(json)
    assert(m.nQueries === 2, s"gc_ms/cpu_ms keys must not inflate nQ: ${m.nQueries}")
    assert(m.calibBeforeMs === 510 && m.totalSec === 3.5)
    val gc = Calibration.parseQueryMetric(json, "gc_ms")
    assert(gc === Map("q_a_one" -> 120.0, "q_b_two" -> 7.0))
    val cpu = Calibration.parseQueryMetric(json, "cpu_ms")
    assert(cpu("q_a_one") === 4400.0)
    val secs = Calibration.parseQueryMetric(json, "queries")
    assert(secs("q_b_two") === 2.0)
    // sidecars without telemetry (r9 and earlier) parse to empty, not throw
    assert(Calibration.parseQueryMetric("""{"total":1.0,"queries":{"q_a":1.0}}""",
      "gc_ms") === Map.empty)
  }

  test("boundedTax scales the marker correction by the query's CPU fraction " +
    "(the quiet-vs-quiet rule's taxed-run fallback)") {
    def near(a: Double, b: Double, eps: Double = 1e-9): Boolean = math.abs(a - b) < eps
    // pure-CPU query (cpu_ms = wall × cores × 1000): full marker correction
    assert(near(Calibration.boundedTax(1.4, wallSec = 2.0, cpuMs = 2.0 * 32 * 1000, cores = 32), 1.4))
    // all-waits query (cpu_ms = 0): no correction — raw IS quiet-equivalent
    assert(near(Calibration.boundedTax(1.4, wallSec = 2.0, cpuMs = 0.0, cores = 32), 1.0))
    // half CPU fraction: correction interpolates linearly
    assert(near(Calibration.boundedTax(1.4, wallSec = 2.0, cpuMs = 1.0 * 32 * 1000, cores = 32), 1.2))
    // the r9-vs-r10 sf1 ambiguity this bound closes: at the r9 sweep's
    // sustained tax 1.379, a typical 20%-CPU-fraction query corrects by
    // only ~1.076, not 1.379 — between the raw (1.0) and full readings
    val eff = Calibration.boundedTax(1.379, wallSec = 1.0, cpuMs = 0.2 * 32 * 1000, cores = 32)
    assert(near(eff, 1.0758, 1e-4))
    assert(eff > 1.0 && eff < 1.379)
    // over-reported cpu_ms (> wall × cores) clamps at the full correction
    assert(near(Calibration.boundedTax(1.4, wallSec = 1.0, cpuMs = 1e9, cores = 32), 1.4))
    // tax below 1.0 never becomes a speedup credit (taxFactor clamp mirrored)
    assert(near(Calibration.boundedTax(0.9, wallSec = 1.0, cpuMs = 1e9, cores = 32), 1.0))
    // degenerate wall/cores: no correction rather than NaN
    assert(Calibration.boundedTax(1.4, wallSec = 0.0, cpuMs = 100.0, cores = 32) === 1.0)
    assert(near(Calibration.boundedAdjustedSec(2.0, 1.4, 2.0 * 32 * 1000, 32), 2.0 / 1.4))
  }

  test("membw leg (r14): quiet band reads tax 1.0; the r13 blindspot " +
    "signature (ALU-quiet + membw-hot) is now visible in the combined tax") {
    // quiet membw readings — anywhere inside the documented self-noise
    // band [95, 200] — never invent a tax
    for (m <- Seq(95L, 111L, 150L, 191L, 200L))
      assert(Calibration.membwTaxFactor(m, m) === 1.0, s"membw=$m")
    // markers absent (pre-r14 sidecars): leg reads 1.0, combined = ALU leg
    assert(Calibration.membwTaxFactor(-1, -1) === 1.0)
    assert(Calibration.combinedTaxFactor(669, 622, -1, -1) ===
      Calibration.taxFactor(669, 622))
    // THE r13 signature: three runs of identical code read 238.7 / 245.8
    // / 310.7 s (a 1.2–1.4× wall inflation) while the ALU markers sat
    // at-or-below quiet (426–541 ms). On such a window the membw leg —
    // which streams DRAM the way the suite's scan/shuffle phases do —
    // must read hot: sustained bandwidth steal that inflates wall 1.3×
    // at least doubles the streaming-sum time (min-of-3 ≥ ~300 ms vs
    // the ≤200 ms quiet edge), and the combined tax must flag it even
    // though the ALU leg still reads 1.0.
    val alu = Calibration.taxFactor(511, 405) // r13 driver markers: ALU-quiet
    assert(alu === 1.0)
    val combined = Calibration.combinedTaxFactor(511, 405, 300, 320)
    assert(combined >= 1.2, s"membw-hot window not flagged: $combined")
    assert(Calibration.membwTaxFactor(300, 320) === combined)
    // one-sided: the tax divides by the quiet-HIGH edge, so it
    // under-reads true contention rather than ever overstating it
    assert(Calibration.membwTaxFactor(400, 400) === 2.0)
  }

  test("membw leg: Markers carries both legs and parseSidecar reads " +
    "membw markers when present, degrades when absent") {
    val m = Calibration.Markers(500, 500, 1.0, 1.0, 100.0, 200,
      membwBeforeMs = 280, membwAfterMs = 320)
    assert(m.aluTax === 1.0)
    assert(m.membwTax === 1.5)
    assert(m.tax === 1.5) // combined = max of the legs
    assert(math.abs(m.adjustedTotalSec - 100.0 / 1.5) < 1e-9)
    val withMembw = """{"total":10.0,"calib_before_ms":500,
      "calib_after_ms":500,"membw_before_ms":150,"membw_after_ms":160,
      "loadavg_before":1.0,"loadavg_after":1.0,
      "queries":{"q_a":10.0}}"""
    val p1 = Calibration.parseSidecar(withMembw)
    assert(p1.membwBeforeMs === 150 && p1.membwAfterMs === 160)
    assert(p1.tax === 1.0)
    // pre-r14 sidecar: no membw fields → -1 → leg silent
    val old = """{"total":10.0,"calib_before_ms":650,"calib_after_ms":650,
      "loadavg_before":1.0,"loadavg_after":1.0,"queries":{"q_a":10.0}}"""
    val p0 = Calibration.parseSidecar(old)
    assert(p0.membwBeforeMs === -1L && p0.membwTax === 1.0)
    assert(p0.tax === Calibration.taxFactor(650, 650))
  }

  test("sched leg (r16): quiet band flags nothing; the r15 driver-window " +
    "signature (ALU+membw quiet, wake-latency hot) fails the quiet gate") {
    // quiet readings — the instrumented conditioned band [115, 160] and
    // anything up to the 320 ms edge — never flag and never tax
    for (s <- Seq(115L, 135L, 153L, 160L, 320L)) {
      assert(Calibration.schedTaxFactor(s, s) === 1.0, s"sched=$s")
      assert(Calibration.windowQuiet(500, 500, 150, 150, s, s))
    }
    // markers absent (pre-r16 sidecars): leg silent, two-leg gate governs
    assert(Calibration.schedTaxFactor(-1, -1) === 1.0)
    assert(Calibration.windowQuiet(500, 500, 150, 150, -1, -1))
    assert(!Calibration.windowQuiet(700, 700, 150, 150, -1, -1))
    // the ALU arm of the gate references the band's HIGH edge: a reading
    // inside the documented 460–560 quiet band is quiet even though the
    // center-referenced tax is 1.0x–1.12x
    assert(Calibration.windowQuiet(540, 520, 150, 150, 140, 140))
    assert(!Calibration.windowQuiet(580, 570, 150, 150, 140, 140))
    // THE r15 signature, pinned: the driver's window ran 374.0 s vs the
    // canonical 301.0 s (1.24×) with tax_alu = tax_membw = 1.000 and
    // every >2× mover wait-dominated (cpu/(wall×32) = 0.03–0.12). A
    // construction-time trial caught the same ambient mode live: ALU
    // 470 ms (quiet), membw 103 ms (quiet), sched 908 ms. Such a window
    // must FAIL the quiet gate even though the tax divisor stays 1.0 —
    // flag, don't tax (the sched response is superlinear: an ~1.25×
    // suite-class co-tenant moved the marker 2.4–4×).
    assert(Calibration.taxFactor(470, 470) === 1.0)
    assert(Calibration.membwTaxFactor(103, 103) === 1.0)
    assert(Calibration.combinedTaxFactor(470, 470, 103, 103) === 1.0)
    assert(!Calibration.windowQuiet(470, 470, 103, 103, 908, 908),
      "the r15 wait-domination signature must fail the quiet gate")
    // each bracket gates separately: one quiet bracket must not average
    // away a hot one (superlinear response makes the mean meaningless)
    assert(!Calibration.windowQuiet(470, 470, 103, 103, 140, 908))
    assert(!Calibration.windowQuiet(470, 470, 103, 103, 908, 140))
    // the exported detection ratio is one-sided over the 320 ms edge
    assert(Calibration.schedTaxFactor(908, 908) > 2.8)
    // ...but deliberately NEVER enters the tax divisor
    val m = Calibration.Markers(470, 470, 1.0, 1.0, 374.0, 312,
      membwBeforeMs = 103, membwAfterMs = 103,
      schedBeforeMs = 908, schedAfterMs = 908)
    assert(m.tax === 1.0, "sched leg must not divide totals")
    assert(m.schedTax > 2.8 && !m.quiet)
    // a fully quiet three-leg window passes
    val q = Calibration.Markers(500, 480, 1.0, 1.0, 301.0, 312,
      membwBeforeMs = 110, membwAfterMs = 120,
      schedBeforeMs = 145, schedAfterMs = 130)
    assert(q.quiet && q.tax === 1.0)
  }

  test("sched leg: parseSidecar reads sched markers when present, " +
    "degrades when absent") {
    val withSched = """{"total":10.0,"calib_before_ms":500,
      "calib_after_ms":500,"membw_before_ms":150,"membw_after_ms":160,
      "sched_before_ms":140,"sched_after_ms":155,
      "loadavg_before":1.0,"loadavg_after":1.0,
      "queries":{"q_a":10.0}}"""
    val p1 = Calibration.parseSidecar(withSched)
    assert(p1.schedBeforeMs === 140 && p1.schedAfterMs === 155)
    assert(p1.quiet && p1.schedTax === 1.0)
    // pre-r16 sidecar: no sched fields → -1 → leg silent
    val old = """{"total":10.0,"calib_before_ms":500,"calib_after_ms":500,
      "membw_before_ms":150,"membw_after_ms":160,
      "loadavg_before":1.0,"loadavg_after":1.0,"queries":{"q_a":10.0}}"""
    val p0 = Calibration.parseSidecar(old)
    assert(p0.schedBeforeMs === -1L && p0.schedTax === 1.0 && p0.quiet)
  }

  // A marker-named query key inside "queries" must not be read as a marker:
  // the scalar scan is anchored to the prefix (ADVICE r9).
  test("scalar markers never collide with query entries") {
    val json = """{"total":9.0,"calib_before_ms":500,"calib_after_ms":500,
      "loadavg_before":1.0,"loadavg_after":1.0,
      "queries":{"q_total":7.0,"q_calib_before_ms":2.0}}"""
    val m = Calibration.parseSidecar(json)
    assert(m.totalSec === 9.0 && m.calibBeforeMs === 500)
    assert(m.nQueries === 2)
  }
}
