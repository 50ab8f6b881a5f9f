package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fork-policy budget math (VERDICT r15 next #2), including
  * its done-criterion: a replay of the r15 timeline — degraded day,
  * 2400 s budget, the 4M leg reached with ~911 s remaining — must end
  * the bench INSIDE the budget with the 4M leg self-described, where
  * the shipped r15 code overran by >900 s (fork timeout granted
  * `remaining + 120` grace, then the catch-all re-ran the timed-out
  * leg in-session).
  */
class BenchPolicySpec extends AnyFunSuite {

  import Bench.ForkPolicy

  test("host factor: median of the canary ratios, clamped [1, 2.5]") {
    // the r16 measurement that motivated median-not-max: parent-JVM
    // ratios single 1.247 / scan 4.813 / shuffle 2.211 on a day the
    // right-sized forks measured 1.1-1.3
    assert(ForkPolicy.hostFactor(Seq(1.247, 4.813, 2.211)) == 2.211)
    assert(ForkPolicy.hostFactor(Seq(1.1, 1.2, 1.3)) == 1.2)
    assert(ForkPolicy.hostFactor(Seq(0.9, 0.95, 0.8)) == 1.0) // luck is not a discount
    assert(ForkPolicy.hostFactor(Seq(3.0, 5.0, 4.0)) == 2.5) // hopeless day clamps
    assert(ForkPolicy.hostFactor(Seq(-1.0, -1.0, -1.0)) == 1.0) // no reference
    assert(ForkPolicy.hostFactor(Seq(-1.0, 1.4, -1.0)) == 1.4) // partial reference
  }

  test("fork timeout: capped at the remaining budget, no grace beyond it") {
    // r15 shipped remaining + 120; the 4M fork ran 1031 s against a
    // 911 s remaining budget. Never again.
    assert(ForkPolicy.timeoutS(remainingS = 911.0, estAdjS = 768.0) == 911L)
    // plentiful budget: 2.5× the estimate bounds a pathological leg
    assert(ForkPolicy.timeoutS(remainingS = 2400.0, estAdjS = 300.0) == 750L)
    // floor: a fork can always start and fail loudly
    assert(ForkPolicy.timeoutS(remainingS = 10.0, estAdjS = 300.0) == 60L)
  }

  test("opportunistic 2M rung: projection from the leg's own fit, affordability has margin") {
    // tonight's measured inputs (2026-08-16, SQ8 kernel): 1M prereq
    // ~45 s, 1M min 45.4 s, slope 1.581 → projected ≈ 2.2·45 + 45.4·2^1.581
    val proj = ForkPolicy.slope2mProjectedS(45.0, 45.4, 1.581)
    assert(proj > 200 && proj < 240, s"projection off: $proj")
    // clean day: fork timeout 1125 s (2.5 × 450), ~300 s elapsed after
    // the canonical rungs → affordable
    assert(ForkPolicy.slope2mAffordable(1125.0, 300.0, proj))
    // degraded day: the fork got only the remaining budget (500 s) and
    // the rungs took longer → declined, canonical data ships intact
    assert(!ForkPolicy.slope2mAffordable(500.0, 400.0, proj))
    // the margin is the fork's own teardown: a projection that fits
    // exactly does NOT pass
    assert(!ForkPolicy.slope2mAffordable(420.0, 100.0, 201.0))
    assert(ForkPolicy.slope2mAffordable(421.0, 100.0, 201.0))
  }

  test("crash fallback only while the budget still covers the estimate") {
    assert(ForkPolicy.crashFallbackAllowed(remainingS = 900.0, estAdjS = 768.0))
    assert(!ForkPolicy.crashFallbackAllowed(remainingS = 500.0, estAdjS = 768.0))
  }

  test("r15 timeline replay: the degraded day ends inside the budget with 4M self-described") {
    // Reconstructed from BENCH_r15 + the driver-run's on-disk artifact:
    // budget 2400 s, core + cold + slope + 2M consumed ~1489 s, the 4M
    // leg's gate saw ~911 s remaining; its fork would have needed
    // >1031 s. Start canaries that day read ~1.17-1.28.
    val budgetS = 2400.0
    val elapsedBefore4m = 1489.0
    val hf = ForkPolicy.hostFactor(Seq(1.17, 1.28, 1.20))
    val estAdj = 600.0 * hf
    val remaining = budgetS - elapsedBefore4m
    // the gate may pass (estimate ≈ 732 < 911) — that is allowed: the
    // timeout cap is what bounds the outcome
    val timeout = ForkPolicy.timeoutS(remaining, estAdj)
    assert(timeout <= remaining.toLong, "a fork may never outlive the budget")
    // the leg needs >1031 s, so the fork times out at `timeout`; the
    // policy stamps fork_timeout and does NOT re-run (not a crash) —
    // total elapsed is bounded by the budget itself
    val elapsedAfter = elapsedBefore4m + timeout
    assert(elapsedAfter <= budgetS,
      s"replay overran the budget: ${elapsedAfter}s > ${budgetS}s")
    // and the driver's ~2520 s wall clock leaves time for finish()
    assert(elapsedAfter <= 2520.0 - 100.0)
  }
}
