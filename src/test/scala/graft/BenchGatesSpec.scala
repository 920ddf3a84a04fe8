package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-13 retry-until-clean contract on the bench trust
  * gates: a contaminated measurement is re-run (bounded) instead of
  * shipping a canonical artifact with `"valid":false` — the r12 driver
  * artifact shipped flagged even though the contention was transient.
  * Round 17 adds the ranked best-attempt contract: when the host never
  * offers an in-band window, a valid fast-host measurement
  * (barrier_state:"fast" at clean steal) ships over a dirty one.
  */
class BenchGatesSpec extends AnyFunSuite {
  import BenchGates.{RankClean, RankFastHost, RankDirty}

  test("retryUntilValid returns the first clean attempt untouched") {
    var calls = 0
    val out = BenchGates.retryUntilValid("t", maxAttempts = 3, sleepMs = 0L) {
      _ => calls += 1; ("""{"valid":true}""", RankClean)
    }
    assert(calls == 1)
    assert(out == """{"valid":true}""")
  }

  test("retryUntilValid re-runs a contaminated attempt until clean, " +
      "passing the 1-based attempt number through") {
    var calls = 0
    val out = BenchGates.retryUntilValid("t", maxAttempts = 3, sleepMs = 0L) {
      n =>
        calls += 1
        assert(n == calls, "attempt number must track the call count")
        if (calls < 3) (s"""{"valid":false,"n":$n}""", RankDirty)
        else (s"""{"valid":true,"n":$n}""", RankClean)
    }
    assert(calls == 3)
    assert(out.contains("\"valid\":true") && out.contains("\"n\":3"))
  }

  test("retryUntilValid ships the LAST flagged attempt when all are dirty") {
    var calls = 0
    val out = BenchGates.retryUntilValid("t", maxAttempts = 3, sleepMs = 0L) {
      _ => calls += 1; (s"""{"valid":false,"n":$calls}""", RankDirty)
    }
    assert(calls == 3)
    // honest record: the artifact is the final measurement, flagged
    assert(out == """{"valid":false,"n":3}""")
  }

  test("retryUntilValid ships a FAST-HOST attempt over dirty ones when " +
      "no in-band window appears (round 17)") {
    var calls = 0
    val out = BenchGates.retryUntilValid("t", maxAttempts = 3, sleepMs = 0L) {
      n =>
        calls += 1
        // attempt 2 is the valid fast-host measurement; 1 and 3 dirty
        if (n == 2) (s"""{"valid":true,"barrier_state":"fast","n":$n}""",
          RankFastHost)
        else (s"""{"valid":false,"n":$n}""", RankDirty)
    }
    assert(calls == 3, "fast-host is not CLEAN — the loop keeps trying")
    assert(out.contains("\"barrier_state\":\"fast\"") &&
      out.contains("\"n\":2"),
      "the best-ranked artifact ships, not the last")
  }

  test("retryUntilValid still stops early on a CLEAN attempt after a " +
      "fast-host one") {
    var calls = 0
    val out = BenchGates.retryUntilValid("t", maxAttempts = 4, sleepMs = 0L) {
      n =>
        calls += 1
        if (n == 1) (s"""{"fast":true,"n":$n}""", RankFastHost)
        else (s"""{"clean":true,"n":$n}""", RankClean)
    }
    assert(calls == 2)
    assert(out.contains("\"clean\":true"))
  }

  test("ParRatioMax default holds and stays overridable by env contract") {
    // default on the reference host (no env override in the test JVM)
    assert(BenchGates.ParRatioMax == 1.35 ||
      sys.env.contains("SPARK_GRAFT_PAR_RATIO_MAX"))
    assert(BenchGates.CalibThreads > 0)
  }

  test("barrier probe reference holds the r16 idle stamp and the 15% " +
      "comparability band is the documented tripwire shape") {
    // reference re-anchored round 16 at a verified-near-zero-steal
    // moment (5594 ms at 0.32% steal — see the RefBarrierMs scaladoc);
    // the band check mirrors the iterative_comparable arithmetic so
    // a band-width change can't drift silently out of the scaladoc
    assert(BenchGates.RefBarrierMs == 5600.0 ||
      sys.env.contains("SPARK_GRAFT_REF_BARRIER_MS"))
    def comparable(ms: Double) =
      math.abs(ms / BenchGates.RefBarrierMs - 1.0) <= 0.15
    val ref = BenchGates.RefBarrierMs
    assert(comparable(ref) && comparable(ref * 1.14) &&
      comparable(ref * 0.86))
    assert(!comparable(ref * 1.26) && !comparable(ref * 0.74),
      "a ±25%-class swing (the r13 q93/q207 magnitude) must flag")
  }
}
