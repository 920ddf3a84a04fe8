package graft

import org.scalatest.funsuite.AnyFunSuite

/** JVM-side contract of the engine-portable hash every replayable
  * sketch rides on (KMV-32 q109, bloom q110, count-min q116/q118):
  * range, collision rate near the birthday bound, and real avalanche —
  * the properties that make the ESTIMATES trustworthy, checked without
  * Spark so they pin the arithmetic itself.
  */
class PortableHashSpec extends AnyFunSuite {
  private val M = graft.functions.PortableHash.Mod
  private val A = graft.functions.PortableHash.Mult

  private def h32(x: Long): Long = {
    val h0 = ((x % M) + M) % M
    val h1 = ((h0 ^ (h0 >> 16)) * A) % M
    val h2 = ((h1 ^ (h1 >> 16)) * A) % M
    h2 ^ (h2 >> 16)
  }

  test("range and determinism over sequential and negative ids") {
    (-1000L until 1000L).foreach { x =>
      val h = h32(x)
      assert(h >= 0 && h < M)
      assert(h === h32(x))
    }
  }

  test("collisions on 100k sequential ids stay near the birthday bound") {
    val n = 100000
    val hs = (0L until n.toLong).map(h32)
    val collisions = n - hs.distinct.size
    // expected n^2 / 2M ≈ 1.16; anything over 20 means structure leaks
    assert(collisions <= 20, s"$collisions collisions in $n sequential ids")
  }

  test("avalanche: flipping the low input bit flips ~half the hash bits") {
    val flips = (0L until 2000L).map { x =>
      java.lang.Long.bitCount(h32(2 * x) ^ h32(2 * x + 1))
    }
    val mean = flips.sum.toDouble / flips.size
    assert(mean > 10 && mean < 22, s"mean bit flips $mean of 32")
    // and no pair may agree completely (that would be a collision of
    // adjacent ids — fatal for the KMV minima)
    assert(flips.forall(_ > 0))
  }

  test("low bits are usable bucket indexes: sequential ids spread mod 64") {
    val counts = (0L until 6400L).map(h32(_) % 64)
      .groupBy(identity).view.mapValues(_.size)
    // 100 expected per bucket; the LCG order key would put exact
    // periodicity here, the real hash must not be off by more than 2x
    assert(counts.size === 64)
    counts.values.foreach(c => assert(c > 50 && c < 200, s"bucket: $c"))
  }
}
