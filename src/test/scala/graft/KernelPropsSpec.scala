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

  // ksDrift's statistic over a (bucket → (ca, cb)) census: D ∈ [0, 1],
  // zero on identical samples, and symmetric under swapping the sides —
  // the same per-bucket double expression the query and oracle share
  private def ksD(census: Map[Long, (Long, Long)]): Double = {
    val na = census.values.map(_._1).sum.toDouble
    val nb = census.values.map(_._2).sum.toDouble
    if (na == 0 || nb == 0) return 0.0
    var (ca, cb, d) = (0L, 0L, 0.0)
    census.toSeq.sortBy(_._1).foreach { case (_, (a, b)) =>
      ca += a; cb += b
      d = math.max(d, math.abs(ca / na - cb / nb))
    }
    d
  }

  private val censusGen =
    Gen.mapOf(Gen.zip(Gen.chooseNum(0L, 50L),
      Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 20L))))

  property("ksDrift: D in [0,1]; identical samples give 0; side-symmetric") =
    forAll(censusGen) { census =>
      val d = ksD(census)
      val swapped = ksD(census.map { case (k, (a, b)) => k -> (b, a) })
      val same = ksD(census.map { case (k, (a, _)) => k -> (a, a) })
      d >= 0.0 && d <= 1.0 + 1e-12 && math.abs(d - swapped) < 1e-12 && same == 0.0
    }

  // mannWhitney's doubled-midrank census identity: Σ ca·(2·cum − c + 1)
  // must equal twice the direct midrank sum over the expanded sample, and
  // the two sides' U statistics must partition 2·nA·nB
  property("mannWhitney: census rank identity == direct midranks; U_A + U_B = nA*nB") =
    forAll(Gen.nonEmptyMap(Gen.zip(Gen.chooseNum(0L, 30L),
      Gen.zip(Gen.chooseNum(0L, 10L), Gen.chooseNum(0L, 10L))))) { census =>
      val sorted = census.toSeq.sortBy(_._1)
      val na = sorted.map(_._2._1).sum
      val nb = sorted.map(_._2._2).sum
      var cum = 0L
      var ranks2A = 0L; var ranks2B = 0L
      sorted.foreach { case (_, (ca, cb)) =>
        val c = ca + cb
        cum += c
        ranks2A += ca * (2 * cum - c + 1)
        ranks2B += cb * (2 * cum - c + 1)
      }
      // direct midranks over the expanded sample (2× to stay integral)
      var pos = 0L
      var direct2A = 0L
      sorted.foreach { case (_, (ca, cb)) =>
        val c = ca + cb
        // 2·midrank = 2·pos + c + 1 for every member of this tie group
        direct2A += ca * (2 * pos + c + 1)
        pos += c
      }
      val u2A = ranks2A - na * (na + 1)
      val u2B = ranks2B - nb * (nb + 1)
      ranks2A == direct2A && u2A + u2B == 2 * na * nb && u2A >= 0 && u2B >= 0
    }

  // tCloseness's fixed-point EMD term: cum·10^6 div n lies in [0, 10^6]
  // for any cum ≤ n, so every per-bucket term is bounded by 10^6 and the
  // BIGINT sum can never overflow regardless of corpus size
  property("t-closeness ppm term: bounded by 1e6 for any cum <= n") =
    forAll(Gen.chooseNum(1L, 1000000000000L), Gen.chooseNum(0L, 1000000L)) {
      (n, cumRaw) =>
        val cum = cumRaw % (n + 1)
        val ppm = cum * 1000000L / n
        ppm >= 0L && ppm <= 1000000L
    }

  // giniTokens' rank formula vs the pairwise mean-absolute-difference
  // definition: 2·(2·Σ i·x(i) − (n+1)·Σx) == ΣΣ|xi − xj|, exactly, in
  // BigInt — the identity that justifies computing G from one ranked sum
  property("gini rank identity == pairwise absolute differences") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L))) { xs0 =>
      val xs = xs0.sorted
      val n = xs.length
      val rankSum = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val total = xs.map(BigInt(_)).sum
      val lhs = 2 * (2 * rankSum - BigInt(n + 1) * total)
      val rhs = (for (a <- xs; b <- xs) yield (BigInt(a) - b).abs).sum
      lhs == rhs
    }

  private def arr(xs: Array[Double]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(xs)

  // ZcaWhiten's fused kernel, probed with STRUCTURAL matrices (not a
  // parallel re-implementation, which would share any indexing bug):
  // identity W must return the centered vector exactly
  property("matvec: identity W == centered input, bit-exact") =
    forAll(Gen.chooseNum(1, 48), Gen.long) { (d, seed) =>
      val rnd = new scala.util.Random(seed)
      val x = Array.fill(d)(rnd.nextDouble() * 10 - 5)
      val mean = Array.fill(d)(rnd.nextDouble() - 0.5)
      val w = Array.tabulate(d * d)(k => if (k / d == k % d) 1.0 else 0.0)
      val got = graft.expressions.MatVecUtil.whiten(arr(x), w, mean)
      (0 until d).forall(i => got.getDouble(i) == x(i) - mean(i))
    }

  // a single nonzero W(i, j) must land w·(x(j) − mean(j)) at OUTPUT row i —
  // the probe that catches a row/column transposition or a flat-index
  // off-by-one, which identity (symmetric) cannot see
  property("matvec: single-entry W(i,j) selects row i from column j") =
    forAll(Gen.chooseNum(2, 48), Gen.long) { (d, seed) =>
      val rnd = new scala.util.Random(seed)
      val i = rnd.nextInt(d); val j = rnd.nextInt(d)
      val x = Array.fill(d)(rnd.nextDouble() * 10 - 5)
      val mean = Array.fill(d)(rnd.nextDouble() - 0.5)
      val wij = rnd.nextDouble() * 4 - 2
      val w = Array.fill(d * d)(0.0)
      w(i * d + j) = wij
      val got = graft.expressions.MatVecUtil.whiten(arr(x), w, mean)
      (0 until d).forall { r =>
        if (r == i) got.getDouble(r) == wij * (x(j) - mean(j))
        else got.getDouble(r) == 0.0
      }
    }
}
