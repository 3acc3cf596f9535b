package graft.expressions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter invariants, driver-side (the expression wraps
  * [[BloomUtil.contains]] verbatim, and its Spark-side behavior is covered
  * by the bloom-decontamination specs and the q_bloom_decontaminate oracle).
  */
class BloomSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(11)
  private def randStr(): String =
    (1 to (3 + rng.nextInt(20))).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  test("no false negatives: every added member is always contained") {
    val members = Array.fill(5000)(randStr()).distinct
    val (m, k) = BloomUtil.sized(members.length.toLong, fpp = 0.01)
    val bits = new Array[Long]((m >>> 6).toInt)
    members.foreach(s => BloomUtil.add(UTF8String.fromString(s), bits, k, m))
    members.foreach(s =>
      assert(BloomUtil.contains(UTF8String.fromString(s), bits, k, m), s))
  }

  test("false-positive rate stays near the configured fpp") {
    val members = Array.fill(5000)(randStr()).distinct
    val memberSet = members.toSet
    val (m, k) = BloomUtil.sized(members.length.toLong, fpp = 0.01)
    val bits = new Array[Long]((m >>> 6).toInt)
    members.foreach(s => BloomUtil.add(UTF8String.fromString(s), bits, k, m))
    val probes = Iterator.continually(randStr()).filterNot(memberSet).take(20000).toSeq
    val fp = probes.count(s => BloomUtil.contains(UTF8String.fromString(s), bits, k, m))
    val rate = fp.toDouble / probes.size
    // generous 5x bound: the estimate has sampling noise and the classic
    // m/k sizing formula is itself approximate
    assert(rate <= 0.05, s"fp rate $rate")
  }

  test("sizing: more members or tighter fpp never shrink the bitmap") {
    val (m1, _) = BloomUtil.sized(1000, 0.01)
    val (m2, _) = BloomUtil.sized(10000, 0.01)
    val (m3, _) = BloomUtil.sized(1000, 0.001)
    assert(m2 > m1 && m3 > m1)
    assert(m1 % 64 === 0 && m2 % 64 === 0)
  }

  test("sizing fails loudly past the 2^37-bit single-array bound (no silent Int overflow)") {
    // ~2e10 members at 1% fpp needs ~1.9e11 bits; `(m >>> 6).toInt` at the
    // allocation sites would overflow into a negative array size
    val e = intercept[IllegalArgumentException](BloomUtil.sized(20000000000L, 0.01))
    assert(e.getMessage.contains("per-partition"))
    val (m, _) = BloomUtil.sized(1400000000L, 0.01) // ~1.3e10 bits: still fine
    assert(m > 0 && m <= (1L << 37))
  }
}
