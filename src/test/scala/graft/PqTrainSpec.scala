package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PqTrain

/** [[PqTrain]] — deterministic per-subspace Lloyd training. */
class PqTrainSpec extends AnyFunSuite {

  private val dim = 16
  private val subDim = 4

  /** Deterministic pseudo-random sample: two clusters + noise. */
  private def sample(n: Int): Array[Array[Float]] = {
    var state = 12345L
    def next(): Float = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
    }
    Array.tabulate(n) { i =>
      val base = if (i % 2 == 0) 0.5f else -0.5f
      Array.fill(dim)(base + 0.3f * next())
    }
  }

  private def sse(s: Array[Array[Float]], cb: Array[Array[Float]]): Double =
    s.iterator.map { v =>
      (0 until dim / subDim).map { mi =>
        cb.iterator.map { c =>
          (0 until subDim).map { i =>
            val d = v(mi * subDim + i).toDouble - c(mi * subDim + i).toDouble
            d * d
          }.sum
        }.min
      }.sum
    }.sum

  test("training is bit-deterministic across invocations") {
    val s = sample(512)
    val a = PqTrain.trainComposite(s, dim, subDim, nCodes = 8, iters = 5)
    val b = PqTrain.trainComposite(s, dim, subDim, nCodes = 8, iters = 5)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("more Lloyd iterations never increase the training SSE") {
    val s = sample(512)
    val errs = Seq(0, 1, 3, 8).map(it =>
      sse(s, PqTrain.trainComposite(s, dim, subDim, nCodes = 8, iters = it)))
    errs.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, s"$errs"); case _ => }
    assert(errs.last < errs.head, "training never improved the codebook")
  }

  test("rejects a sample smaller than the codebook and a non-dividing subDim") {
    intercept[IllegalArgumentException](PqTrain.trainComposite(sample(4), dim, subDim, 8, 1))
    intercept[IllegalArgumentException](PqTrain.trainComposite(sample(16), dim, 5, 8, 1))
  }
}
