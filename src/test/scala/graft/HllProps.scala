package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Hll

/** ScalaCheck: the HLL integer pieces must agree with plain reference
  * computations on arbitrary inputs — the comparison-chain rank and the
  * scaled harmonic indicator are what both engines replay, so a
  * boundary error here silently skews every register. Column-level
  * equivalence with DuckDB is the oracle gate (q77/q80); these pin the
  * Scala-side DEFINITIONS against java.lang.Long bit arithmetic. */
object HllProps extends Properties("Hll") {

  // reference rank: leading-zero count within WBits bits + 1; w = 0 → WBits+1
  private def refRho(w: Long): Int =
    if (w == 0) Hll.WBits + 1
    else Hll.WBits - (63 - java.lang.Long.numberOfLeadingZeros(w))

  private val wGen: Gen[Long] = Gen.frequency(
    3 -> Gen.choose(0L, (1L << Hll.WBits) - 1),
    1 -> Gen.oneOf(0L, 1L, (1L << Hll.WBits) - 1, 1L << (Hll.WBits - 1)))

  property("duckRhoCase matches the bit-length reference for every w") =
    Prop.forAll(wGen) { w =>
      // evaluate the generated CASE chain symbolically: first branch taken
      val chain = (1 to Hll.WBits)
        .find(j => w >= (1L << (Hll.WBits - j)))
        .getOrElse(Hll.WBits + 1)
      chain == refRho(w)
    }

  property("scaled indicators sum exactly: Σ 2^(WBits+1−ρ) fits and inverts") =
    Prop.forAll(Gen.listOfN(64, wGen)) { ws =>
      val rhos = ws.map(refRho)
      val s = rhos.map(r => 1L << (Hll.WBits + 1 - r)).sum
      // 64 registers × max indicator 2^26 < 2^33 — far from overflow, and
      // the estimate's integer division is well-defined (s ≥ 64 · 1 ≥ 1)
      s > 0 && s <= 64L * (1L << (Hll.WBits + 1)) &&
        Hll.EstNum / (1000L * s) >= 0
    }

  property("rank is monotone: larger w never has larger rho") =
    Prop.forAll(wGen, wGen) { (a, b) =>
      if (a <= b) refRho(a) >= refRho(b) else refRho(a) <= refRho(b)
    }
}
