package graft

import graft.operators.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("extensions expose native expressions as SQL functions") {
    // force a NEW session (getOrCreate would silently reuse the base test
    // session and never apply the extensions); the SparkContext is shared
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s ne base)
      val dot = s.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head.getDouble(0)
      assert(dot === 11.0)
      val sh = s.sql(
        "SELECT word_shingles(array('a','b','c','d'), 2) AS s").head.getSeq[String](0)
      assert(sh === Seq("a b", "b c", "c d"))
      val sim = s.sql("SELECT simhash64(array('x','y')) AS h").head.getLong(0)
      val sim2 = s.sql("SELECT simhash64(array('x','y')) AS h").head.getLong(0)
      assert(sim === sim2)
      val mh = s.sql("SELECT minhash_signature(array('sh1','sh2')) AS m").head.getSeq[Long](0)
      assert(mh.length === 128)
      val fnv = s.sql("SELECT fnv1a64('abc') AS h").head.getLong(0)
      assert(fnv === graft.expressions.Fnv1a.hash("abc".getBytes("UTF-8")))
      val bg = s.sql("SELECT bigram_stats(array('a','b','a','b','c')) AS s").head.getSeq[Long](0)
      assert(bg === Seq(2L, 4L)) // "a b" twice of 4 bigrams
      val tg = s.sql("SELECT top_ngram_stats(array('a','b','a','b'), 2) AS s").head.getSeq[Long](0)
      assert(tg === Seq(2L, 3L, 3L)) // "a b" twice, 3 chars, 3 bigram positions
      // tie-break: equal counts -> lexicographically smallest gram wins
      val tie = s.sql("SELECT top_ngram_stats(array('z','q','a','b'), 2) AS s").head.getSeq[Long](0)
      assert(tie === Seq(1L, 3L, 3L)) // "a b" (smallest), 3 chars
      val di8 = s.sql(
        "SELECT vec_dot_i8(cast(array(127, -2) AS array<tinyint>), cast(array(2, 3) AS array<tinyint>)) AS d")
        .head.getLong(0)
      assert(di8 === 127L * 2 - 2 * 3)
      val tk = s.sql(
        """SELECT k, top_k_rows(struct(-score, id), struct(id), 2) AS t FROM VALUES
          |  ('a', 1L, 5.0), ('a', 2L, 9.0), ('a', 3L, 7.0) AS v(k, id, score)
          |GROUP BY k""".stripMargin)
        .head.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      assert(tk === Seq(2L, 3L)) // top-2 by score desc
      // null payload structs are SKIPPED (not stored as empty rows that would
      // break partial-agg serialization) — reachable only via this SQL form
      val tkNull = s.sql(
        """SELECT k, top_k_rows(struct(-score, id),
          |                     if(id = 2, cast(null AS struct<id:bigint>), struct(id)), 2) AS t
          |FROM VALUES ('a', 1L, 5.0), ('a', 2L, 9.0), ('a', 3L, 7.0) AS v(k, id, score)
          |GROUP BY k""".stripMargin)
        .head.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      assert(tkNull === Seq(3L, 1L)) // id=2's null payload skipped; next best admitted
      val q = s.sql("SELECT round(quality_score_raw('the cat sat on the mat.'), 6) AS q").head.getDouble(0)
      assert(q > 0.0 && q <= 1.0)
      // span_fingerprints == fnv of the lowered joined window
      val sf = s.sql("SELECT span_fingerprints(array('A','b','C'), 2) AS f").head.getSeq[Long](0)
      assert(sf === Seq(
        graft.expressions.Fnv1a.hash("a b".getBytes("UTF-8")),
        graft.expressions.Fnv1a.hash("b c".getBytes("UTF-8"))))
      // span_cut_rewrite drops the covered window
      val sr = s.sql(
        "SELECT span_cut_rewrite(array('a','b','c','d'), array(1L), 2) AS t").head.getString(0)
      assert(sr === "a d")
      // freq_items_mg: exact when vocabulary <= k, sorted (est desc, item asc)
      val fi = s.sql(
        """SELECT freq_items_mg(item, 4) AS hh FROM VALUES
          |  ('x'), ('x'), ('y') AS v(item)""".stripMargin)
        .head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
      assert(fi === Seq(("x", 2L), ("y", 1L)))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import TestSpark.spark.implicits._
    val big = (1 to 2000).map(i => (if (i % 10 == 0) 99L else i.toLong % 50, i)).toDF("k", "v")
    val small = (0L to 99L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("bloomReducedJoin equals the plain join and actually prunes the fact side") {
    import TestSpark.spark.implicits._
    val fact = (1 to 5000).map(i => (i.toLong % 1000, i)).toDF("k", "v")
    val dim = Seq(3L, 7L, 11L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val reduced = Skew.bloomReducedJoin(fact, dim, "k")
    val got = reduced.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got === plain)
    assert(plain.size === 15) // 3 dim keys × 5 fact rows each
    // the Bloom pre-filter sits on the fact side of the join (checked on
    // the analyzed plan: over a LocalRelation the optimizer FOLDS the
    // deterministic predicate away entirely — the parquet-backed driver
    // query's physical plan is audited in PlanAuditSpec)
    val p = reduced.queryExecution.analyzed.toString
    assert(p.contains("bloom_might_contain"), p)
    // and it prunes: with fpp 1% over 1000 candidate keys, the filtered
    // fact is a small superset of the 15 matches, far below the 5000 input
    val kept = fact.filter(Skew.bloomKeyFilter(dim, "k").get).count()
    assert(kept >= 15 && kept < 500, s"bloom kept $kept of 5000")
  }

  test("bloomReducedJoin tolerates NULL dim keys — the build used to NPE " +
       "on the driver before the join could even plan") {
    import TestSpark.spark.implicits._
    val fact = (1 to 100).map(i => (i.toLong % 10, i)).toDF("k", "v")
    val dim = Seq(Some(3L), None, Some(7L))
      .map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val got = Skew.bloomReducedJoin(fact, dim, "k").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // NULL never equi-matches, so dropping it from the bitmap build keeps
    // the plain join's result bit-for-bit
    assert(got === plain)
    assert(plain.size === 20) // keys 3 and 7, 10 fact rows each
  }

  test("bloomReducedJoin above maxBuildKeys falls back to the plain join") {
    import TestSpark.spark.implicits._
    val fact = (1 to 100).map(i => (i.toLong, i)).toDF("k", "v")
    val dim = (1L to 50L).map(k => (k, s"d$k")).toDF("k", "name")
    val out = Skew.bloomReducedJoin(fact, dim, "k", maxBuildKeys = 10)
    assert(!out.queryExecution.executedPlan.toString.contains("bloom_might_contain"))
    assert(out.count() === 50)
  }
}
