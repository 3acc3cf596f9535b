package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests (ScalaCheck) for the pure integer kernels that the
  * oracle-matched queries and their SQL twins both rely on — the algebra
  * must hold for EVERY (n, p), not just the corpus the driver happens to
  * generate.
  */
object KernelProps extends Properties("IntegerKernels") {

  // winsorizedStats' discrete-percentile rank: the cross-multiplied band
  // (rn−1)·1000 < n·p ≤ rn·1000 must pick exactly ceil(n·p/1000) — one
  // valid rank, always within [1, n]
  property("rank band == ceil(n*p/1000), uniquely, in range") =
    forAll(Gen.chooseNum(1L, 2000000L), Gen.chooseNum(1, 1000)) { (n, p) =>
      val expected = ((BigInt(n) * p + 999) / 1000).toLong
      def inBand(rn: Long) = (rn - 1) * 1000 < n * p && n * p <= rn * 1000
      inBand(expected) && !inBand(expected - 1) && !inBand(expected + 1) &&
        expected >= 1 && expected <= n
    }

  // nucleusVocab's membership test (cumBefore·1000 < p·total) must select
  // exactly the MINIMAL count-descending prefix whose mass reaches p·total
  property("nucleus = minimal prefix with mass*1000 >= p*total") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000L)), Gen.chooseNum(1, 1000)) {
      (cnts0, p) =>
        val cnts = cnts0.sorted(Ordering[Long].reverse)
        val total = cnts.sum
        val cumBefore = cnts.scanLeft(0L)(_ + _)
        val kept = cnts.indices.filter(i => cumBefore(i) * 1000 < p.toLong * total)
        val mass = kept.map(cnts).sum
        kept.toList == (0 until kept.length).toList && // a prefix
          mass * 1000 >= p.toLong * total &&           // sufficient
          (kept.isEmpty ||                             // minimal
            (mass - cnts(kept.last)) * 1000 < p.toLong * total)
    }

  // ngramNovelty's bucket assignment: every id lands in [0, buckets);
  // buckets are monotone in id; the id range is covered without gaps when
  // ids are dense
  property("novelty bucket: bounded, monotone") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 1000000L),
      Gen.chooseNum(1, 64)) { (mn, spanLen, buckets) =>
      val mx = mn + spanLen - 1
      val span = math.max(1L, mx - mn + 1L)
      def bucket(id: Long) = math.min(buckets - 1L, (id - mn) * buckets / span)
      val lo = bucket(mn); val hi = bucket(mx)
      lo == 0L && hi == buckets - 1L || spanLen < buckets // tiny spans may not fill
    } && forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 1000000L),
      Gen.chooseNum(1, 64), Gen.chooseNum(0L, 1000000L)) { (mn, spanLen, buckets, off) =>
      val mx = mn + spanLen - 1
      val span = math.max(1L, mx - mn + 1L)
      def bucket(id: Long) = math.min(buckets - 1L, (id - mn) * buckets / span)
      val id = mn + (off % spanLen)
      val b = bucket(id)
      b >= 0L && b < buckets && (id == mn || bucket(id - 1) <= b)
    }
}
