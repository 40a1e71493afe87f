package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.curation.Curation

/** Property tests for DSIR-style importance weighting
  * ([[Curation.dsirWeights]]): the distributed pipeline (md5-bucketed
  * histograms, broadcast log-ratio table, doc-grain aggregate) must
  * equal a brute-force in-memory reference on arbitrary random corpora,
  * and the sign semantics must behave — target-composed documents score
  * positive, raw-only documents negative. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  /** The md5 bridge, in-memory: first 7 hex chars of md5(token) mod B. */
  private def bucket(t: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 7)
    java.lang.Long.parseLong(hex, 16) % B
  }

  private def toks(text: String): Seq[String] =
    text.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  /** Brute-force reference: id -> (n_tokens, unrounded logw). */
  private def ref(docs: Seq[(Long, String, Boolean)])
      : Map[Long, (Long, Double)] = {
    val all = docs.flatMap { case (id, text, tgt) =>
      toks(text).map(t => (id, bucket(t), tgt))
    }
    val raw = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tgt = all.filter(_._3).groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    val nR = raw.values.sum.toDouble
    val nT = tgt.values.sum.toDouble
    val llr = raw.map { case (b, cR) =>
      b -> math.log(((tgt.getOrElse(b, 0L) + 1L) / (nT + B)) /
        ((cR + 1L) / (nR + B)))
    }
    all.groupBy(_._1).map { case (id, rows) =>
      id -> (rows.size.toLong, rows.map(r => llr(r._2)).sum)
    }
  }

  private def run(docs: Seq[(Long, String, Boolean)])
      : Map[Long, (Long, Double, Boolean)] = {
    val df = docs.toDF("doc_id", "text", "is_tgt")
    Curation.dsirWeights(df, "doc_id", "text", col("is_tgt"), B)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
  }

  private val word: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "mu", "nu")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))

  test("dsirWeights equals the in-memory reference on random corpora") {
    (0 until 5).foreach { trial =>
      val n = 20 + trial * 7
      val texts = (0 until n).flatMap(i =>
        doc.apply(Gen.Parameters.default, Seed(trial * 1000L + i)))
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, i % 3 == 0)
      }
      val got = run(docs)
      val want = ref(docs)
      assert(got.keySet === want.keySet)
      want.foreach { case (id, (nTok, lw)) =>
        val (gn, glw, gsel) = got(id)
        assert(gn === nTok, s"n_tokens of doc $id")
        assert(math.abs(glw - lw) < 1e-6, s"logw of doc $id")
        if (math.abs(lw) > 1e-5)
          assert(gsel === (lw > 0), s"selected of doc $id")
      }
    }
  }

  test("target-composed docs score positive, raw-only negative") {
    // target docs use one vocabulary, raw-only docs a disjoint one:
    // every target-vocab bucket is relatively enriched under the
    // target histogram, so the pure-target doc must come out selected
    // and the pure-raw doc must not. Counts are repeated well past the
    // bucket count so add-1 smoothing (which shrinks ratios toward 1
    // when B >> counts) cannot flip the signs.
    def rep(s: String) = (s + " ") * 50
    val docs = Seq[(Long, String, Boolean)](
      (1L, rep("alpha beta"), true),
      (2L, rep("beta alpha"), true),
      (3L, rep("gamma delta"), false),
      (4L, rep("delta gamma"), false),
      (5L, rep("alpha gamma"), false)) // mixed probe doc
    val got = run(docs)
    assert(got(1L)._3 && got(2L)._3, "pure-target docs selected")
    assert(!got(3L)._3 && !got(4L)._3, "pure-raw docs rejected")
    assert(got(1L)._2 > got(5L)._2 && got(5L)._2 > got(3L)._2,
      "mixed doc scores strictly between pure-target and pure-raw")
  }

  test("zero-token docs drop; weights are length-additive") {
    val docs = Seq[(Long, String, Boolean)](
      (1L, "alpha", true), (2L, "alpha alpha", true),
      (3L, "   ", false), (4L, "beta", false))
    val got = run(docs)
    assert(!got.contains(3L), "whitespace-only doc emits no row")
    // doubling a doc's tokens doubles its (unrounded) weight
    assert(math.abs(got(2L)._2 - 2 * got(1L)._2) < 2e-6)
  }
}
