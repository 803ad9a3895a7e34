package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention gate (r12 verdict #3): committed bench
  * artifacts must be fingerprint-clean. The gate is a pure predicate
  * over the start fingerprint, so it is tested three ways: the quiet
  * band passes, the r12 CONTAMINATED run's recorded fingerprint is
  * flagged, and a DELIBERATELY-LOADED live measurement is flagged —
  * the case the REQUIRE_QUIET refusal branch (Bench.main, exit 3)
  * gates on.
  */
class BenchGateSpec extends AnyFunSuite {

  test("quiet fingerprints pass; the r12 contaminated fingerprint is flagged") {
    // the quiet band measured on this host (load1m < 1 idle, spin1
    // ~600-680 ms, spin32x ~900-1100 ms)
    assert(!Bench.contended(Bench.EnvFingerprint(0.5, 650, 1050, 8.0, 32)))
    assert(!Bench.contended(Bench.EnvFingerprint(1.2, 700, 1100, 8.0, 32)))
    // bench_out.json of r12 — the artifact whose phantom regressions
    // cost a judge adjudication: start load1m 3.28
    assert(Bench.contended(Bench.EnvFingerprint(3.28, 679, 946, 89.0, 32)))
    // a descheduled probe flags even at low load average (load1m lags
    // a fresh burst by design — the spin probes are the fast signal)
    assert(Bench.contended(Bench.EnvFingerprint(0.3, 1900, 2600, 8.0, 32)))
  }

  test("a deliberately-loaded host is flagged by a live fingerprint measurement") {
    val cpus = Runtime.getRuntime.availableProcessors
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // 2x-cpus external busy threads: the probe gets ~1/3 of the
    // machine, so spin1 and spinAll both inflate ~3x past the bounds
    val hogs = (1 to 2 * cpus).map { _ =>
      val t = new Thread(() => {
        var x = 1L
        while (!stop.get()) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
        if (x == 42L) println(x) // defeat DCE
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      val fp = Bench.measureFingerprint(cpus)
      info(s"loaded fingerprint: ${fp.json}")
      assert(Bench.contended(fp),
        s"deliberately-loaded measurement not flagged: ${fp.json}")
    } finally {
      stop.set(true)
      hogs.foreach(_.join(1000))
    }
  }
}
