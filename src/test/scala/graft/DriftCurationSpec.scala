package graft

import org.apache.spark.sql.functions._
import graft.validate.Drift
import graft.curation.Curation
import graft.text.TextAnalysis

/** Behavioral specs for the round-4 continuation operators that are
  * otherwise oracle-only: PSI drift, temporal split, boilerplate
  * mining. */
class DriftCurationSpec extends SparkSpec {
  import spark.implicits._

  test("psi ≈ 0 when both slices share a distribution") {
    // identical uniform halves — the only drift is ε-floor noise
    val df = spark.range(10000)
      .select(($"id" % 2 === 0).as("ref"), ($"id" % 100).cast("double")
        .as("v"), lit("g").as("g"))
    val r = Drift.psi(df, "g", "v", col("ref"), binWidth = 10.0,
      nBins = 10).head()
    assert(math.abs(r.getAs[Double]("psi")) < 1e-9)
  }

  test("psi flags a shifted distribution above the 0.25 alarm bar") {
    // ref uniform on [0,50); cur uniform on [50,100) — total shift
    val df = spark.range(10000)
      .select(($"id" < 5000).as("ref"),
        (when($"id" < 5000, $"id" % 50).otherwise($"id" % 50 + 50))
          .cast("double").as("v"),
        lit("g").as("g"))
    val r = Drift.psi(df, "g", "v", col("ref"), binWidth = 10.0,
      nBins = 10).head()
    assert(r.getAs[Double]("psi") > 0.25,
      s"disjoint supports must alarm, got ${r.getAs[Double]("psi")}")
  }

  test("temporal split: per-key ordering, not a global cut") {
    val ev = Tables.load(spark, sf0001, "events")
    val split = Curation.assignTemporalSplit(ev, "user_id", "ts",
      "event_id", testFrac = 0.2)
    // every multi-event user has BOTH sides, and train strictly
    // precedes test inside each user's own timeline
    val perUser = split.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(when($"split" === "test", 1).otherwise(0)).as("n_test"),
        (max(when($"split" === "train", $"ts")) <
          min(when($"split" === "test", $"ts"))).as("ok"))
    assert(perUser.filter($"n" >= 5 && ($"n_test" === 0 || !$"ok"))
      .count() === 0)
    // a GLOBAL 20% cut would leave early-active users 100% train;
    // per-key splitting must give every ≥5-event user some test share
    assert(perUser.filter($"n" >= 5).count() ===
      perUser.filter($"n" >= 5 && $"n_test" > 0).count())
  }

  test("psi keeps a NULL group key as a group") {
    val df = Seq[(Option[String], Double, Boolean)](
      (None, 5.0, true), (None, 15.0, false),
      (Some("g"), 5.0, true), (Some("g"), 15.0, false))
      .toDF("g", "v", "ref")
    val out = Drift.psi(df, "g", "v", col("ref"), binWidth = 10.0,
      nBins = 10)
    assert(out.count() === 2, "NULL-keyed group must survive the totals join")
    assert(out.filter($"g".isNull).count() === 1)
  }

  test("boilerplate mining keeps a NULL source as a group") {
    val docs = Seq((1L, "a b a b", null.asInstanceOf[String]),
      (2L, "a b c d", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source")
    val mined = TextAnalysis.boilerplateShingles(docs, "doc_id", "text",
      "source", n = 2, minFrac = 0.9)
    assert(mined.filter($"shingle" === "a b").count() === 1)
  }

  test("boilerplate mining finds a planted template span") {
    val docs = (0 until 20).map { i =>
      (i.toLong, s"unique$i words here copyright acme corp footer " +
        s"more$i filler${i * 7}", "siteA")
    }.toDF("doc_id", "text", "source")
    val mined = TextAnalysis.boilerplateShingles(docs, "doc_id", "text",
      "source", n = 2, minFrac = 0.9)
    val shingles = mined.select("shingle").as[String].collect().toSet
    assert(shingles.contains("copyright acme"))
    assert(shingles.contains("acme corp"))
    // per-doc unique spans must NOT surface
    assert(!shingles.exists(_.startsWith("unique")))
  }
}
