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

  test("letter maps are pairwise distinct across the full 312-replica range") {
    val maps = (0 until 312).map(GenScale.perm(lower, _))
    assert(maps.distinct.size === maps.size)
  }

  // sf16 extension: the embedding transform must stay an isometry (it
  // may only reorder and sign-flip coordinates, never mix them), be
  // pairwise distinct across replicas, and reduce to the committed
  // rotation-only scheme for k < 64 so sf1/sf4 regenerate bit-identically
  private val probe = Vector.tabulate(64)(i => (i + 1).toDouble)

  test("embedding transform is a signed permutation for every replica") {
    for (k <- 0 until 312) {
      val out = GenScale.applyEmbed(probe, k)
      assert(out.map(math.abs).sorted === probe,
        s"replica $k mixed or lost coordinates")
    }
  }

  test("embedding transforms are pairwise distinct across 312 replicas") {
    val outs = (0 until 312).map(GenScale.applyEmbed(probe, _))
    assert(outs.distinct.size === outs.size)
  }

  test("k < 64 embedding transform is the committed pure rotation") {
    for (k <- 0 until 64)
      assert(GenScale.applyEmbed(probe, k) === probe.drop(k) ++ probe.take(k),
        s"replica $k diverged from the sf1/sf4 rotation")
  }

  test("embedding transform preserves inner products exactly") {
    val u = Vector.tabulate(64)(i => math.sin(i + 1.0))
    val v = Vector.tabulate(64)(i => math.cos(3.0 * i + 2.0))
    def dotSorted(a: Vector[Double], b: Vector[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sorted
    for (k <- Seq(1, 63, 64, 65, 128, 200, 311)) {
      val (tu, tv) = (GenScale.applyEmbed(u, k), GenScale.applyEmbed(v, k))
      // same multiset of per-dimension products → the same inner
      // product up to FP summation order (the original rotation-only
      // scheme's fidelity)
      assert(dotSorted(tu, tv) === dotSorted(u, v), s"replica $k")
    }
  }
}
