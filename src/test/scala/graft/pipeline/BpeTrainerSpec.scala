package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE tokenizer training: hand-computed merge tables on the classic
  * low/lower/newest/widest corpus, canonical greedy-leftmost semantics on
  * identical-symbol runs, deterministic lexicographic tie-breaks, and
  * encode/train consistency.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def merges(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toList
      .sortBy(_._1)

  test("train learns the hand-computed merges on the classic BPE corpus") {
    // census: low×3, lower×2, newest×4, widest×1
    val docs = Seq("low low low lower lower newest newest newest newest widest")
      .toDF("text")
    val out = merges(BpeTrainer.train(docs, "text", rounds = 2))
    // round 1: 'we' appears in lower (×2) and newest (×4) → 6, the max
    // round 2: 'lo' (3+2=5) ties 'st' (4+1=5); lexicographic pick is (l, o)
    assert(out === List((1L, "w", "e", 6L), (2L, "l", "o", 5L)))
  }

  test("merge fold is canonical greedy leftmost on identical-symbol runs") {
    // 'aaab': pair (a,a) occurs at positions 1 and 2 (count 2, overlapping);
    // greedy leftmost merges position 1 only → [aa, a, b], NOT [aa, ab]
    val docs = Seq("aaab").toDF("text")
    val out = merges(BpeTrainer.train(docs, "text", rounds = 2))
    assert(out.head === ((1L, "a", "a", 2L)))
    // round 2 sees the post-merge state [aa, a, b]: candidate pairs are
    // (aa,a) and (a,b), tied at 1 — lexicographic picks (a, b)
    assert(out(1) === ((2L, "a", "b", 1L)))
  }

  test("train stops early once the vocabulary is fully merged") {
    val docs = Seq("ab ab").toDF("text")
    val out = merges(BpeTrainer.train(docs, "text", rounds = 10))
    assert(out === List((1L, "a", "b", 2L))) // one merge exhausts all pairs
  }

  test("encode replays the learned merges onto new text") {
    val docs = Seq("low low low lower lower newest newest newest newest widest")
      .toDF("text")
    val rules = merges(BpeTrainer.train(docs, "text", rounds = 2))
      .map(m => (m._2, m._3))
    val enc = Seq("lowest we").toDF("text")
      .select(BpeTrainer.encode("text", rules).as("toks"))
      .head.getSeq[String](0)
    // lowest → l o w e s t; merge(w,e) → l o we s t; merge(l,o) → lo we s t
    // "we" → w e → we
    assert(enc === Seq("lo", "we", "s", "t", "we"))
  }

  test("vocab table agrees with inline encode for every census word") {
    val docs = Seq("low low low lower lower newest newest newest newest widest")
      .toDF("text")
    val rules = merges(BpeTrainer.train(docs, "text", rounds = 2)).map(m => (m._2, m._3))
    val fromVocab = BpeTrainer.vocab(docs, "text", rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val inline = Seq("low", "lower", "newest", "widest").map { w =>
      w -> Seq(w).toDF("text").select(BpeTrainer.encode("text", rules))
        .head.getSeq[String](0)
    }.toMap
    assert(fromVocab === inline)
    assert(fromVocab("lower") === Seq("lo", "we", "r"))
  }

  test("driver fast path and forced distributed path learn identical merge tables") {
    // maxDriverVocab = 0 forces the distributed per-round loop; the default
    // takes the collected-census path — selection order, tie-breaks, and
    // pair counts must agree round for round (including a count tie that
    // only the lexicographic rule resolves, and an early stop)
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "aaab banana bandana", "zz zz yzy").toDF("text")
    val fast = merges(BpeTrainer.train(docs, "text", rounds = 6))
    val dist = merges(BpeTrainer.train(docs, "text", rounds = 6, maxDriverVocab = 0L))
    assert(fast === dist)
    assert(fast.size === 6)
    // vocab: driver replay == chained-fold distributed replay, word for word
    val rules = fast.map(m => (m._2, m._3))
    def tbl(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2))).toSet
    assert(tbl(BpeTrainer.vocab(docs, "text", rules)) ===
      tbl(BpeTrainer.vocab(docs, "text", rules, maxDriverVocab = 0L)))
  }
}
