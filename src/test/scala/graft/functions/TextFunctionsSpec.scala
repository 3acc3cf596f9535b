package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens and tokenCount: whitespace split, empty-safe") {
    val df = Seq("  the quick  brown   fox ", "", "one").toDF("text")
    val counts = df.select(TextFunctions.tokenCount(col("text"))).collect().map(_.getInt(0)).toSeq
    assert(counts === Seq(4, 0, 1))
  }

  test("punctCount counts only the closed class [.,;:!?]") {
    val df = Seq("Hello, world! How are you? Fine; thanks: yes. (ok)").toDF("text")
    assert(df.select(TextFunctions.punctCount(col("text"))).head.getInt(0) === 6)
  }

  test("stopwordRatio on a stopword-heavy vs stopword-free sentence") {
    val df = Seq("the cat is on the mat", "zebra quagga okapi").toDF("text")
    val rs = df.select(TextFunctions.stopwordRatio(col("text"))).collect().map(_.getDouble(0))
    assert(rs(0) > 0.5 && rs(1) === 0.0)
  }

  test("meanTokenLength") {
    val df = Seq("ab abcd").toDF("text")
    assert(df.select(TextFunctions.meanTokenLength(col("text"))).head.getDouble(0) === 3.0)
  }

  test("langId picks the language whose stopwords dominate") {
    val df = Seq(
      "the cat and the dog are in the house that is big",
      "el perro y la casa es grande por la noche con luz",
      "der Hund und die Katze ist mit dem Ball auf den Tisch",
      "le chien et le chat est dans la maison pour une nuit").toDF("text")
    val langs = df.select(TextFunctions.langId(col("text"))).collect().map(_.getString(0)).toSeq
    assert(langs === Seq("en", "es", "de", "fr"))
  }

  test("qualityScore is in [0,1] and ranks clean text above junk") {
    val clean = ("the quick brown fox jumps over the lazy dog and runs far " * 10).trim
    val junk = "!!!! ???? ;;;; aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa !!!!"
    val df = Seq(clean, junk).toDF("text")
    val qs = df.select(TextFunctions.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
    assert(qs(0) > qs(1))
  }

  test("fingerprintMod: deterministic, content-sensitive, bounded") {
    val df = Seq("abc", "abc", "abd").toDF("text")
    val fps = df.select(TextFunctions.fingerprintMod(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
  }

  test("fingerprint64 stays within 56 bits") {
    val df = Seq("some long text " * 100).toDF("text")
    val fp = df.select(TextFunctions.fingerprint64(col("text"))).head.getLong(0)
    assert(fp >= 0 && fp < (1L << 56))
  }

  test("shingleFingerprints: one hash per n-token window") {
    val df = Seq("a b c d e").toDF("text")
    val fps = df.select(TextFunctions.shingleFingerprints(col("text"), 3)).head.getSeq[Long](0)
    assert(fps.length === 3) // windows: abc bcd cde
    assert(fps.distinct.length === 3)
  }

  test("subwordCount splits word runs and punctuation marks") {
    val df = Seq("don't stop, now!").toDF("text")
    // don ' t stop , now ! → 7
    assert(df.select(TextFunctions.subwordCount(col("text"))).head.getInt(0) === 7)
  }

  test("redactPii masks emails, urls, and phone-like digit runs") {
    val df = Seq(
      "mail me at jane.doe+x@example.co.uk today",
      "see https://example.com/a?b=1 and http://x.io",
      "call +1 (555) 123-4567 or 555.867.5309 now",
      "version 1.2 of 2024 stays").toDF("text")
    val got = df.select(TextFunctions.redactPii(col("text"))).collect().map(_.getString(0))
    assert(got(0) === "mail me at <EMAIL> today")
    assert(got(1) === "see <URL> and <URL>")
    assert(got(2) === "call <PHONE> or <PHONE> now")
    assert(got(3) === "version 1.2 of 2024 stays") // short digit runs untouched
  }

  test("redactPii phone rule needs >= 7 actual digits; digit-dense dates/IPs redact by design") {
    val df = Seq(
      "1.2 2024 release notes",    // 6 digits spread over a separator run: keep
      "sections 1.2.3 and 4.5",    // 5 digits: keep
      "meet on 2024-01-15 ok",     // 8 digits: redacted (documented trade)
      "host 192.168.0.1 up").toDF("text") // 10 digits: redacted (documented trade)
    val got = df.select(TextFunctions.redactPii(col("text"))).collect().map(_.getString(0))
    assert(got(0) === "1.2 2024 release notes")
    assert(got(1) === "sections 1.2.3 and 4.5")
    assert(got(2) === "meet on <PHONE> ok")
    assert(got(3) === "host <PHONE> up")
  }

  test("gopherFlags: each rule trips on a crafted violator and passes a clean doc") {
    val clean = (("the be to of and that have with " * 8) +
      ("alpha beta gamma delta " * 5)).trim                     // 84 words, clean
    val tooShort = "the be to of and that have with"            // 8 words
    val symbols = (("the be to of and " * 10).trim + " " + "# " * 30).trim // 30 '#' vs 80 words
    val bullets = Seq.fill(10)("- the be to of and that have with item").mkString("\n") +
      "\nplain closing line of prose the be to of and that have with" // 10/11 bullet lines
    val numeric = ("the be to of and that have with " * 4 +
      "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 " * 2).trim // 40/72 numeric words
    val noStops = ("alpha beta gamma delta epsilon zeta eta theta " * 8).trim
    val ellipsis = (Seq.fill(4)("the be to of and that have with more...") ++
      Seq.fill(6)("the be to of and that have with prose")).mkString("\n") // 4/10 = 40% > 30%
    val ellipsisEdge = (Seq.fill(3)("the be to of and that have with more...") ++
      Seq.fill(7)("the be to of and that have with prose")).mkString("\n") // exactly 30% — kept (paper removes strictly >30%)
    val df = Seq((1L, clean), (2L, tooShort), (3L, symbols), (4L, bullets),
      (5L, numeric), (6L, noStops), (7L, ellipsis), (8L, ellipsisEdge)).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextFunctions.gopherFlags(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    def f(id: Long, name: String): Boolean =
      got(id).getBoolean(got(id).schema.fieldIndex(name))
    assert(f(1L, "keep"), s"clean doc must pass: ${got(1L)}")
    assert(!f(2L, "f_wc") && !f(2L, "keep"))
    assert(!f(3L, "f_symbol") && !f(3L, "keep"))
    assert(!f(4L, "f_bullet") && !f(4L, "keep"))
    assert(!f(5L, "f_alpha") && !f(5L, "keep"))
    assert(!f(6L, "f_stop") && !f(6L, "keep"))
    assert(!f(7L, "f_ellipsis") && !f(7L, "keep"), s"40% ellipsis lines must trip: ${got(7L)}")
    assert(f(8L, "f_ellipsis") && f(8L, "keep"), s"exactly 30% ellipsis lines is kept: ${got(8L)}")
  }

  test("repetitionFlags: top-n-gram coverage rules trip on crafted repeaters") {
    val clean = (1 to 60).map(i => s"word$i").mkString(" ") // all n-grams unique
    // "spam ham" repeated: bigram "spam ham" covers ~half the doc -> f_top2 trips
    val bigramHeavy = (("spam ham " * 12).trim + " " +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu").trim
    // one 4-gram repeated amid filler: covers > 16% but each bigram < 20%
    val fourgramHeavy = (Seq.fill(4)("one two three four").mkString(" ") + " " +
      ("filler" + (1 to 14).map(i => s" word$i").mkString)).trim
    val df = Seq((1L, clean), (2L, bigramHeavy), (3L, fourgramHeavy))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextFunctions.repetitionFlags(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    def f(id: Long, name: String): Boolean =
      got(id).getBoolean(got(id).schema.fieldIndex(name))
    assert(f(1L, "keep"), s"clean doc must pass: ${got(1L)}")
    assert(!f(2L, "f_top2") && !f(2L, "keep"), s"bigram repeater must trip: ${got(2L)}")
    assert(!f(3L, "f_top4") && !f(3L, "keep"), s"4-gram repeater must trip: ${got(3L)}")
  }
}
