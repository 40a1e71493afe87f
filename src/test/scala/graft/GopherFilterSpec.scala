package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Rule-by-rule semantics of the Gopher-style composite quality gate
  * ([[TextAnalysis.compositeFilterReport]]): each crafted doc trips
  * exactly one rule, the clean doc trips none, and the report's
  * accounting columns reconcile (dropped + kept = docs; kept_tokens
  * counts only survivors). */
class GopherFilterSpec extends SparkSpec {
  import spark.implicits._

  // thresholds chosen for hand-checkable docs
  private def report(docs: Seq[(String, String)]) =
    TextAnalysis.compositeFilterReport(
      docs.toDF("src", "text"), "text", "src",
      minTokens = 3L, maxTokens = 6L,
      wordLenLo = 2.0, wordLenHi = 6.0,
      minStopword = 0.1, maxRepetition = 0.5)

  test("each rule fires on exactly its crafted doc; clean doc survives") {
    val out = report(Seq(
      "s" -> "the cat sat on mats",     // clean: 5 toks, awl 3.0, sw 2/5, rep 0
      "s" -> "the cat",                 // too short (2 < 3)
      "s" -> "the a of to in it is on", // too long (8 > 6); awl 2.0 boundary-in
      "s" -> "a ab abcdefghij",         // clean: awl 13/3 ≈ 4.33 in band
      "s" -> "the abcdefghijklm xy",    // clean: awl 18/3 = 6.0 boundary-in
      "s" -> "zz yy xx ww",             // no stopwords: swr 0 < 0.1
      "s" -> "the cat the cat the cat"  // bigrams 5, distinct 2 → rep 0.6 > 0.5
    )).collect()
    assert(out.length === 1)
    val r = out.head
    def l(name: String): Long = r.getAs[Long](name)
    assert(l("n_docs") === 7)
    assert(l("n_too_short") === 1)
    assert(l("n_too_long") === 1)
    // the band is exclusive-outside (awl < lo || awl > hi): 4.33 and
    // the two boundary values 2.0 / 6.0 all stay IN — zero trips here
    assert(l("n_word_len") === 0)
    assert(l("n_low_stopword") === 1)
    assert(l("n_repetitive") === 1)
    assert(l("n_dropped") === 4)
    assert(l("kept_tokens") ===
      5L /* clean */ + 3L /* doc4 */ + 3L /* doc5 */)
  }

  test("word-length rule fires on out-of-band mean; boundaries inclusive") {
    val out = report(Seq(
      "w" -> "aaaaaaaaaa bbbbbbbbbb ccc",  // awl (10+10+3)/3 ≈ 7.67 > 6
      "w" -> "a b ccc",                    // awl 5/3 ≈ 1.67 < 2
      "w" -> "the ab cdef"                 // awl 9/3 = 3.0 in band, has stopword
    )).collect().head
    assert(out.getAs[Long]("n_word_len") === 2)
    assert(out.getAs[Long]("n_dropped") >= 2)
  }

  test("empty-ish text drops via word-len guard, never divides by zero") {
    val out = report(Seq("e" -> "   ", "e" -> "the cat sat"))
      .collect().head
    // "   " tokenizes to zero tokens: n=0 < 3 (short) and awl
    // coalesces to 0.0 < 2.0 (word_len) — dropped, no NaN anywhere
    assert(out.getAs[Long]("n_too_short") === 1)
    assert(out.getAs[Long]("n_word_len") === 1)
    assert(out.getAs[Long]("n_dropped") === 1)
    assert(out.getAs[Long]("kept_tokens") === 3L)
  }

  test("rule counts are non-exclusive; n_dropped counts docs once") {
    val out = report(Seq(
      "m" -> "zz zz" // short AND no-stopword (its 1 bigram is unique → rep 0)
    )).collect().head
    assert(out.getAs[Long]("n_too_short") === 1)
    assert(out.getAs[Long]("n_low_stopword") === 1)
    assert(out.getAs[Long]("n_dropped") === 1)
  }
}
