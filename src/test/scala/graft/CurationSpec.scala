package graft

import org.apache.spark.sql.functions._
import graft.curation.Curation

/** Curation operators: determinism, mixture control, shuffle-freedom of
  * the sampling path, decontamination candidate correctness. */
class CurationSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf001, "documents")

  test("hash sample is deterministic and close to the target rate") {
    val a = Curation.sampleByHash(docs, "doc_id", "s1", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.sampleByHash(docs, "doc_id", "s1", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "same salt must select the same rows")
    val n = docs.count().toDouble
    assert(a.size > n * 0.04 && a.size < n * 0.2,
      s"10% sample of $n docs was ${a.size}")
    // a different salt draws an (almost surely) different sample
    val c = Curation.sampleByHash(docs, "doc_id", "s2", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== c)
  }

  test("rate 0 keeps nothing, rate 100 keeps everything") {
    assert(Curation.sampleByHash(docs, "doc_id", "s", 0).count() === 0L)
    assert(Curation.sampleByHash(docs, "doc_id", "s", 100).count() ===
      docs.count())
  }

  test("sampling is a pure filter: no shuffle in the plan") {
    val plan = Curation.sampleByHash(docs, "doc_id", "s", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample must not shuffle:\n$plan")
  }

  test("stratified rates bias the mixture the right way") {
    val kept = Curation.sampleStratified(docs, "doc_id", "lang", "m",
        rates = Map("en" -> 10), defaultPct = 90)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    val deRate = kept.getOrElse("de", 0L).toDouble / total("de")
    assert(enRate < deRate,
      s"en sampled at 10% ($enRate) must keep less than de at 90% ($deRate)")
  }

  test("shuffle key is a deterministic permutation (no collisions here)") {
    val keys = docs.select(Curation.shuffleKey("x", col("doc_id")))
      .collect().map(_.getString(0))
    assert(keys.distinct.length === keys.length)
    // order by key differs from natural doc_id order
    val shuffled = docs.select(col("doc_id"),
        Curation.shuffleKey("x", col("doc_id")).as("k"))
      .orderBy("k").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(shuffled !== shuffled.sorted)
  }

  test("decontamination flags the planted overlap, broadcast-joined") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "totally unrelated words here now")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "zzz alpha beta gamma yyy"),
      (101L, "one two three")).toDF("doc_id", "text")
    val hits = Curation.contaminated(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "alpha beta gamma"; doc 2 shares "one two three"
    assert(hits === Map(1L -> 1L, 2L -> 1L))
    val plan = Curation.contaminated(corpus, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n$plan")
  }

  test("curriculum bins split each stratum into balanced quartiles") {
    val binned = Curation.curriculumBins(
      docs.select(col("doc_id"), col("lang"),
        length(col("text")).cast("double").as("score")),
      "lang", col("score"), "doc_id", bins = 4)
    val counts = binned.groupBy("lang", "__bin").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val sizes = (1 to 4).map(b => counts.getOrElse((lang, b), 0L))
      assert(sizes.sum === n)
      assert(sizes.max - sizes.min <= 1,
        s"$lang quartiles must differ by at most 1: $sizes")
    }
  }

  test("split assignment is total, proportional, and subset-stable") {
    val docs = Tables.load(spark, sf001, "documents")
    val split = Curation.assignSplit(docs, "doc_id", "tvt",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    // every row in exactly one split
    assert(counts.values.sum == n)
    assert(counts.keySet == Set("train", "val", "test"))
    // hash banding lands near the targets (28-bit uniform hash)
    assert(math.abs(counts("train").toDouble / n - 0.90) < 0.03)
    // membership is a pure function of the key: filtering the corpus
    // cannot move a surviving document between train and eval
    val subset = Curation.assignSplit(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "tvt", Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val joined = split.select(col("doc_id"), col("split").as("full"))
      .join(subset.select(col("doc_id"), col("split").as("sub")), "doc_id")
    assert(joined.filter(col("full") =!= col("sub")).count() == 0)
    // no shuffle: pure projection plan
    val plan = split.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // bad percentages rejected
    intercept[IllegalArgumentException] {
      Curation.assignSplit(docs, "doc_id", "x", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("weighted sampling: per-row rates bias the draw, clamped, deterministic") {
    import graft.curation.Curation
    // rate 0 keeps nothing, rate >= 100 keeps everything (clamped)
    assert(Curation.sampleByWeight(docs, "doc_id", "w", lit(0)).count() == 0)
    assert(Curation.sampleByWeight(docs, "doc_id", "w", lit(250)).count() ==
      docs.count())
    // length-weighted: kept docs are longer on average than the corpus
    val kept = Curation.sampleByWeight(docs, "doc_id", "w",
      col("n_chars") / lit(8))
    val keptAvg = kept.agg(avg(col("n_chars"))).head().getDouble(0)
    val corpusAvg = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(keptAvg > corpusAvg,
      s"weighting must bias toward long docs: $keptAvg vs $corpusAvg")
    // deterministic
    assert(kept.count() == Curation.sampleByWeight(docs, "doc_id", "w",
      col("n_chars") / lit(8)).count())
  }

  test("k-per-group sample: exact sizes, deterministic, uniform-ish") {
    val k = 25
    val sampled = Curation.sampleKPerGroup(docs, "lang", "doc_id", "kg", k)
    val sizes = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      assert(sizes(lang) == math.min(k.toLong, n), s"$lang: ${sizes(lang)}")
    }
    // same salt → same members; different salt → different draw
    val a = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.sampleKPerGroup(docs, "lang", "doc_id", "kg", k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c = Curation.sampleKPerGroup(docs, "lang", "doc_id", "kg2", k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a != c)
  }

  test("zscore: moments per group, zero-variance group yields null") {
    import spark.implicits._
    import graft.curation.Features
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    val z = Features.zscore(df, "g", "v").orderBy("g", "v").collect()
    // group a: mean 2, sigma_pop sqrt(2/3)
    val sig = math.sqrt(2.0 / 3.0)
    assert(math.abs(z(0).getDouble(2) - (-1.0 / sig)) < 1e-12)
    assert(math.abs(z(1).getDouble(2)) < 1e-12)
    assert(math.abs(z(2).getDouble(2) - 1.0 / sig) < 1e-12)
    // group b: zero variance → null, not 0
    assert(z(3).isNullAt(2) && z(4).isNullAt(2))
  }

  test("winsorize clips into the exact per-group quantile band") {
    import spark.implicits._
    import graft.curation.Features
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Features.winsorize(df, "g", "v", 0.10, 0.90)
      .select($"v", $"clipped").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // quantile_cont(0.1) of 1..100 = 10.9; (0.9) = 90.1
    assert(math.abs(out(1.0) - 10.9) < 1e-9)
    assert(math.abs(out(100.0) - 90.1) < 1e-9)
    assert(out(50.0) == 50.0) // interior values untouched
    intercept[IllegalArgumentException] {
      Features.winsorize(df, "g", "v", 0.9, 0.1)
    }
  }

  test("temperatureMixture: alpha=1 no-op, alpha=0.5 flattens, smallest kept") {
    import spark.implicits._
    import graft.curation.Curation
    val df = ((1 to 900).map(i => (i, "big")) ++
      (901 to 1000).map(i => (i, "small"))).toDF("id", "dom")
    // alpha = 1: identity mixture, every row survives
    assert(Curation.temperatureMixture(df, "dom", "id", "t1", 1.0)
      .count() === 1000L)
    val half = Curation.temperatureMixture(df, "dom", "id", "t5", 0.5)
    val n = half.groupBy($"dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest domain keeps rate 1.0 => all 100 rows
    assert(n("small") === 100L)
    // big keeps ~sqrt(100/900)=1/3 of 900 = ~300 (hash-Bernoulli, wide band)
    assert(n("big") > 200L && n("big") < 400L)
    // deterministic: same salt, same survivors
    val again = Curation.temperatureMixture(df, "dom", "id", "t5", 0.5)
    assert(again.select($"id").except(half.select($"id")).count() === 0L)
    intercept[IllegalArgumentException] {
      Curation.temperatureMixture(df, "dom", "id", "x", 1.5)
    }
  }

  test("kAnonymityRisk flags exactly the classes below k") {
    import spark.implicits._
    import graft.validate.Privacy
    val df = Seq(("US", "a"), ("US", "a"), ("US", "a"),
      ("US", "b"), ("DE", "a")).toDF("country", "seg")
    val risky = Privacy.kAnonymityRisk(df,
        Seq(col("country"), col("seg")), k = 3L)
      .orderBy($"country", $"seg").collect()
    assert(risky.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq === Seq(("DE", "a", 1L), ("US", "b", 1L)))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityRisk(df, Seq.empty, 3L)
    }
  }

  test("madOutliers flags by Hampel rule and survives nulls") {
    import spark.implicits._
    import graft.curation.Features
    // group g: 1..9 plus a wild 1000; median 5.5, dev of 1000=994.5,
    // MAD = median of sorted devs (0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,
    // 4.5,994.5) = 2.5
    val df = (((1 to 9).map(_.toDouble) :+ 1000.0).map(v => ("g", Some(v)))
      :+ ("g", None)).toDF("k", "v")
    val out = Features.madOutliers(df, "k", "v")
    val flagged = out.filter($"is_outlier").select($"v").collect()
    assert(flagged.map(_.getDouble(0)).toSeq === Seq(1000.0))
    val r = out.filter($"v" === 5.0).head
    assert(r.getAs[Double]("median") === 5.5)
    assert(r.getAs[Double]("mad") === 2.5)
    // null value: flag stays null, row retained
    assert(out.filter($"v".isNull).head.isNullAt(
      out.columns.indexOf("is_outlier")))
    // constant group: MAD 0 flags nothing
    val const = Seq(("c", 7.0), ("c", 7.0), ("c", 7.0)).toDF("k", "v")
    assert(Features.madOutliers(const, "k", "v")
      .filter($"is_outlier").count() === 0L)
  }

  test("poissonBootstrapCI brackets the mean deterministically") {
    import spark.implicits._
    import graft.curation.Features
    // two groups with distinct scales; a null value row is ignored
    val rows = (1 to 200).map(i => ("lo", i.toLong, Some(i % 10 + 1.0))) ++
      (1 to 200).map(i => ("hi", 1000L + i, Some(i % 10 + 100.0))) :+
      (("lo", 9999L, Option.empty[Double]))
    val df = rows.toDF("g", "k", "v")
    val out = Features.poissonBootstrapCI(df, "g", "k", "v", reps = 50)
      .orderBy($"g").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n") === 200L)
      val (m, lo, hi) = (r.getAs[Double]("mean"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      // the point estimate sits inside a proper, tight interval
      assert(lo < m && m < hi && hi - lo < 2.0)
    }
    // i % 10 over 1..200 averages 4.5 → means 104.5 and 5.5
    assert(out(0).getAs[String]("g") === "hi"
      && out(0).getAs[Double]("mean") === 104.5)
    assert(out(1).getAs[Double]("mean") === 5.5)
    // hash-derived weights: a second run is bit-identical
    val again = Features.poissonBootstrapCI(df, "g", "k", "v", reps = 50)
      .orderBy($"g").collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
    intercept[IllegalArgumentException] {
      Features.poissonBootstrapCI(df, "g", "k", "v", reps = 1)
    }
  }

  test("dpCountRelease: deterministic noise, scale tracks 1/epsilon") {
    import spark.implicits._
    import graft.curation.Features
    val df = (1 to 100).map(i => (if (i % 2 == 0) "a" else "b", i))
      .toSeq.toDF("g", "v")
    def release(eps: Double, salt: String = "dp") =
      Features.dpCountRelease(df, "g", eps, salt).orderBy($"g")
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val r1 = release(0.5)
    // identical rerun — republishing can't leak via averaging
    assert(release(0.5) === r1)
    // a fresh salt is a fresh draw (with these salts the noise differs)
    assert(release(0.5, salt = "dp2") !== r1)
    // noise is bounded by b·ln(1/(2·2^-28)) ≈ 37 at eps=0.5 — and the
    // noisy counts stay in a sane band around the true count of 50
    r1.values.foreach(v => assert(math.abs(v - 50.0) < 40.0))
    // tighter epsilon (bigger b) must move at least one group further
    val r01 = release(0.1)
    assert(r01.keys == r1.keys)
    val drift1 = r1.map { case (k, v) => math.abs(v - 50.0) }.sum
    val drift01 = r01.map { case (k, v) => math.abs(v - 50.0) }.sum
    assert(drift01 > drift1, "Laplace scale must grow as epsilon shrinks")
    intercept[IllegalArgumentException] {
      Features.dpCountRelease(df, "g", epsilon = 0.0)
    }
  }
}
