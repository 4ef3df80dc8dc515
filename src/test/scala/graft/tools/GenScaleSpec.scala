package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Guards the scale-fixture generator's perturbation invariants: the
  * per-replica alphabet maps must be bijections (or `translate` would
  * merge characters and shrink shingle vocabularies), pairwise
  * distinct (or two replicas would share a vocabulary and inflate the
  * cross-replica near-dup candidate space), and — for k < 26 — equal
  * to the caesar rotation that generated the committed sf1 fixtures,
  * so regenerating sf1 with the extended generator stays
  * bit-identical. */
class GenScaleSpec extends AnyFunSuite {
  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val digits = "0123456789"

  test("every replica's letter map is a bijection") {
    for (k <- 0 until 63)
      assert(GenScale.perm(lower, k).toSet.size === 26,
        s"replica $k letter map is not a permutation")
  }

  test("letter maps are pairwise distinct across 63 replicas") {
    val maps = (0 until 63).map(GenScale.perm(lower, _))
    assert(maps.distinct.size === maps.size)
  }

  test("k < 26 degenerates to the sf1 caesar rotation") {
    for (k <- 0 until 26) {
      val rot = lower.drop(k % lower.length) + lower.take(k % lower.length)
      assert(GenScale.perm(lower, k) === rot, s"replica $k diverged from sf1")
    }
  }

  test("digit map stays the sf1 shift for all replicas") {
    for (k <- 0 until 63) {
      val rot = digits.drop(k % 10) + digits.take(k % 10)
      assert(GenScale.perm(digits, k) === rot)
    }
  }

  test("identity replica is untouched") {
    assert(GenScale.perm(lower, 0) === lower)
    assert(GenScale.perm(digits, 0) === digits)
  }
}
