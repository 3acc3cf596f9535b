package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import java.sql.Timestamp

/** The live == batch parity of the token-bucket rate limiter reduces to one
  * algebraic fact: folding a key's ordered history in two halves with the
  * state carried across the split equals folding it whole, for EVERY split
  * point. ScalaCheck drives the pure fold directly (no Spark session) so
  * the invariant is checked over thousands of event shapes, not just the
  * spec's hand cases.
  */
object BucketFoldProps extends Properties("TokenBucketFold") {

  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  private val eventsGen: Gen[List[RateEvent]] = for {
    n <- Gen.chooseNum(1, 40)
    gaps <- Gen.listOfN(n, Gen.chooseNum(0L, 3000000L)) // 0–3 s between events
  } yield {
    var t = 1700000000000000L // fixed epoch base, micros
    gaps.zipWithIndex.map { case (g, i) => t += g; RateEvent(1L, ts(t), i.toLong) }
  }

  property("state carry across any split == whole-history fold") =
    forAll(eventsGen, Gen.chooseNum(1L, 5L), Gen.chooseNum(1L, 10L),
      Gen.chooseNum(0, 40)) { (evs, cap, rate, splitRaw) =>
      val capMicro = cap * 1000000L
      val split = splitRaw % (evs.length + 1)
      val (whole, _) = StatefulOps.bucketFold(capMicro, rate)(1L, evs, None)
      val (h1, s1) = StatefulOps.bucketFold(capMicro, rate)(1L, evs.take(split), None)
      val (h2, _) = StatefulOps.bucketFold(capMicro, rate)(1L, evs.drop(split),
        if (split == 0) None else Some(s1))
      (h1 ++ h2) == whole
    }

  property("saturating refill: a months-long gap at a high rate refills to exactly cap (no overflow)") =
    forAll(Gen.chooseNum(1L, 1000000000000L), Gen.chooseNum(1L, 1000000000000L)) {
      (cap, rate) =>
        val capMicro = cap * 1000000L
        val base = 1700000000000000L
        val evs = List(RateEvent(1L, ts(base), 0L),
          RateEvent(1L, ts(base + 200L * 86400L * 1000000L), 1L)) // 200-day gap
        val (out, _) = StatefulOps.bucketFold(capMicro, rate)(1L, evs, None)
        // second event must find a FULL bucket, then consume one token
        out(1).admitted && out(1).tokens_after_micro == capMicro - 1000000L
    }

  property("level always within [0, cap]; rejects only when below one token") =
    forAll(eventsGen, Gen.chooseNum(1L, 5L), Gen.chooseNum(1L, 10L)) { (evs, cap, rate) =>
      val capMicro = cap * 1000000L
      val (out, _) = StatefulOps.bucketFold(capMicro, rate)(1L, evs, None)
      out.forall(d => d.tokens_after_micro >= 0L &&
        d.tokens_after_micro <= capMicro &&
        (d.admitted || d.tokens_after_micro < 1000000L))
    }
}
