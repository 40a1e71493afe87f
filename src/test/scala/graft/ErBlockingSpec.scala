package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ErBlocking

/** Distinct-name-grain ER blocking ([[graft.operators.ErBlocking]]):
  * the class rollup, the enforced block cap, and the arithmetic
  * expansion back to row-level answers — proven equal to the naive
  * row-pair join it replaces. */
class ErBlockingSpec extends SparkSpec {
  import spark.implicits._

  // (key, name) rows with duplicated names across two blocks
  private def fixture: DataFrame = Seq(
    (1L, "hot bolt"), (2L, "hot bolt"), (7L, "hot bolt"), (9L, "hot bolt"),
    (3L, "hot gear"), (5L, "hot gear"),
    (4L, "hot ring"),
    (6L, "old bolt"), (8L, "old bolt"),
    (10L, "old ring")).toDF("key", "name")

  private def classesOf(df: DataFrame, keep: Int): DataFrame =
    ErBlocking.nameClasses(df, split($"name", " ").getItem(0), $"name",
      $"key", keep)

  test("nameClasses: cnt, max_key, sorted smallest keys per class") {
    val got = classesOf(fixture, 2)
      .select($"block", $"name", $"cnt", $"max_key", $"low_keys")
      .as[(String, String, Long, Long, Seq[Long])].collect().toSet
    assert(got === Set(
      ("hot", "hot bolt", 4L, 9L, Seq(1L, 2L)),
      ("hot", "hot gear", 2L, 5L, Seq(3L, 5L)),
      ("hot", "hot ring", 1L, 4L, Seq(4L)),
      ("old", "old bolt", 2L, 8L, Seq(6L, 8L)),
      ("old", "old ring", 1L, 10L, Seq(10L))))
  }

  test("requireBoundedBlocks: pathological block fails loudly") {
    // one block, 60 distinct names — a blocking key that stopped
    // discriminating; the guard must name the block and refuse
    val bad = (0 until 60).map(i => (i.toLong, f"blk name$i%02d")).toDF("key", "name")
    val classes = classesOf(bad, 1)
    val e = intercept[IllegalStateException] {
      ErBlocking.requireBoundedBlocks(classes, 50L, "spec")
    }
    assert(e.getMessage.contains("blk=60"))
    assert(e.getMessage.contains("quadratic"))
    // at or under the cap passes silently
    ErBlocking.requireBoundedBlocks(classes, 60L, "spec")
    ErBlocking.requireBoundedBlocks(classesOf(fixture, 1), 3L, "spec")
  }

  test("classPairs: multiplicities and strictness") {
    val pairs = ErBlocking.classPairs(classesOf(fixture, 1), strict = false)
      .select($"block", $"a_name", $"b_name", $"n_cross")
      .as[(String, String, String, Long)].collect().toSet
    // same-name classes with cnt >= 2 self-pair with C(cnt,2); the
    // singleton classes (hot ring, old ring) must NOT self-pair
    assert(pairs === Set(
      ("hot", "hot bolt", "hot bolt", 6L),   // C(4,2)
      ("hot", "hot gear", "hot gear", 1L),
      ("hot", "hot bolt", "hot gear", 8L),   // 4*2
      ("hot", "hot bolt", "hot ring", 4L),
      ("hot", "hot gear", "hot ring", 2L),
      ("old", "old bolt", "old bolt", 1L),
      ("old", "old bolt", "old ring", 2L)))
    val strict = ErBlocking.classPairs(classesOf(fixture, 1), strict = true)
      .select($"a_name", $"b_name").as[(String, String)].collect()
    assert(strict.forall { case (a, b) => a < b })
    assert(strict.length === 4)
  }

  test("editSegmentPairs: exact recall+precision vs brute force (random)") {
    // seeded random strings over a tiny alphabet so near-pairs are
    // plentiful; equivalence with the O(n²) cross join proves BOTH
    // pigeonhole recall (no pair missed) and verify precision
    val rng = new scala.util.Random(7L)
    val strs = (0 until 70).map { _ =>
      val l = 5 + rng.nextInt(7)
      (1 to l).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
    }.distinct
    for (tau <- Seq(1, 2, 3)) {
      val df = strs.toDF("name")
      val got = ErBlocking.editSegmentPairs(df, "name", tau)
        .as[(String, String, Long)].collect().toSet
      val want = (for {
        a <- strs; b <- strs if a < b
        d = bruteEd(a, b) if d <= tau
      } yield (a, b, d.toLong)).toSet
      assert(got === want, s"tau=$tau: diff ${got.diff(want)} / ${want.diff(got)}")
    }
  }

  test("editSegmentPairs: finds cross-block pairs first-token blocking misses") {
    val df = Seq("hot bolt", "old bolt", "hot gear", "big gears")
      .toDF("name")
    val got = ErBlocking.editSegmentPairs(df, "name", tau = 3)
      .as[(String, String, Long)].collect().toSet
    val ed = bruteEd("hot bolt", "old bolt") // 3: different first token
    assert(ed <= 3 && got.contains(("hot bolt", "old bolt", ed.toLong)),
      s"cross-block near-match missed: $got")
  }

  test("editSegmentPairs: short-string contract and bucket guard trip") {
    intercept[IllegalStateException] {
      ErBlocking.editSegmentPairs(Seq("ab", "abcdef").toDF("name"),
        "name", tau = 3) // "ab" shorter than tau+1
    }
    // 20 strings sharing a long constant prefix: every prefix-region
    // segment bucket holds all 20 — the skew guard must refuse at 10
    val pref = (0 until 20).map(i => f"aaaaaaaaaaaa$i%02d").toDF("name")
    val e = intercept[IllegalStateException] {
      ErBlocking.editSegmentPairs(pref, "name", tau = 2, maxBucket = 10L)
    }
    assert(e.getMessage.contains("segment blocking"))
    // with an adequate cap the same input works and is exact
    val ok = ErBlocking.editSegmentPairs(pref, "name", tau = 2,
      maxBucket = 100L).as[(String, String, Long)].collect()
    val names = (0 until 20).map(i => f"aaaaaaaaaaaa$i%02d")
    val want = (for {
      a <- names; b <- names if a < b
      d = bruteEd(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(ok.toSet === want)
  }

  test("property: class-grain expansion equals naive row pairs (random)") {
    // randomized corpora with heavy name duplication: the class-grain
    // pair-count expansion and the candidate top-k must equal the
    // naive row-pair join on every draw
    val rng = new scala.util.Random(23L)
    for (trial <- 0 until 5) {
      val blocks = Seq("aa", "bb", "cc")
      val names = for (b <- blocks; i <- 0 until (2 + rng.nextInt(3)))
        yield s"$b n$i"
      val rows = (0 until 120).map { k =>
        (k.toLong, names(rng.nextInt(names.size)))
      }
      val df = rows.toDF("key", "name")
      val classes = classesOf(df, 4)
      val scored = ErBlocking.classPairs(classes, strict = false)
        .withColumn("score",
          when($"a_name" === $"b_name", 1.0).otherwise(0.9))
      // total pair multiplicity per block == naive pair count
      val got = scored.groupBy($"block").agg(sum($"n_cross").as("n"))
        .as[(String, Long)].collect().toMap
      val byBlock = rows.groupBy(_._2.split(" ")(0))
      val want = byBlock.map { case (b, rs) =>
        b -> (rs.size.toLong * (rs.size - 1) / 2)
      }
      assert(got === want.filter(_._2 > 0), s"trial $trial")
      // top-3 row pairs from low_keys == naive top-3
      val w = Window.partitionBy($"block")
        .orderBy(desc("score"), $"a_key", $"b_key")
      val topGot = ErBlocking.candidateRowPairs(scored, "score")
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"block", $"rk", $"a_key", $"b_key")
      val p = df.withColumn("block", split($"name", " ").getItem(0))
      val topWant = p.as("a").join(p.as("b"),
          $"a.block" === $"b.block" && $"a.key" < $"b.key")
        .select($"a.block".as("block"), $"a.key".as("a_key"),
          $"b.key".as("b_key"),
          when($"a.name" === $"b.name", 1.0).otherwise(0.9).as("score"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"block", $"rk", $"a_key", $"b_key")
      assert(topGot.exceptAll(topWant).isEmpty &&
        topWant.exceptAll(topGot).isEmpty, s"trial $trial top-k diverged")
    }
  }

  /** Reference Levenshtein (full DP) for the equivalence oracles. */
  private def bruteEd(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("top-k via candidateRowPairs equals the naive row-pair join") {
    // score = jaro_winkler-like proxy: equality-based tiers so the
    // test controls tie structure without the native expression
    val k = 3
    val classes = classesOf(fixture, k + 1)
    val scored = ErBlocking.classPairs(classes, strict = false)
      .withColumn("score",
        when($"a_name" === $"b_name", 1.0)
          .when(length($"a_name") === length($"b_name"), 0.95)
          .otherwise(0.5))
      .filter($"score" >= 0.95)
    val w = Window.partitionBy($"block")
      .orderBy(desc("score"), $"a_key", $"b_key")
    val got = ErBlocking.candidateRowPairs(scored, "score")
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter($"rk" <= k)
      .select($"block", $"rk", $"a_key", $"b_key", $"score")
    // naive row-level reference: every pair, same ordering
    val p = fixture.withColumn("block", split($"name", " ").getItem(0))
    val naive = p.as("a").join(p.as("b"),
        $"a.block" === $"b.block" && $"a.key" < $"b.key")
      .select($"a.block".as("block"), $"a.key".as("a_key"),
        $"b.key".as("b_key"),
        when($"a.name" === $"b.name", 1.0)
          .when(length($"a.name") === length($"b.name"), 0.95)
          .otherwise(0.5).as("score"))
      .filter($"score" >= 0.95)
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter($"rk" <= k)
      .select($"block", $"rk", $"a_key", $"b_key", $"score")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      s"candidate top-$k diverges from naive:\n" +
        got.orderBy($"block", $"rk").collect().mkString("\n") + "\nvs\n" +
        naive.orderBy($"block", $"rk").collect().mkString("\n"))
    // and the expanded pair counts match the naive count
    val gotCounts = scored.groupBy($"block").agg(sum($"n_cross").as("n"))
      .as[(String, Long)].collect().toMap
    val naiveCounts = p.as("a").join(p.as("b"),
        $"a.block" === $"b.block" && $"a.key" < $"b.key"
          && ($"a.name" === $"b.name"
            || length($"a.name") === length($"b.name")))
      .groupBy($"a.block").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(gotCounts === naiveCounts)
  }
}
