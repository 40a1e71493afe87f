package graft

import org.apache.spark.sql.functions._
import graft.operators.{Association, SetSimJoin}
import graft.text.TextAnalysis.tokens

/** Prefix-filtered set-similarity join (`operators/SetSimJoin.scala`)
  * and market-basket association (`operators/Association.scala`):
  * candidate completeness vs the naive forms, real pruning, guards. */
class SetSimJoinSpec extends SparkSpec {

  private def corpora = {
    val d = Tables.load(spark, sf001, "documents")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    (d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
  }

  /** Naive all-pairs Jaccard — the quadratic truth the prefix filter
    * must reproduce exactly. */
  private def naive(tau: Double) = {
    val (l, r) = corpora
    l.select(col("doc_id").as("id_a"),
        array_distinct(col("toks")).as("ta"))
      .crossJoin(r.select(col("doc_id").as("id_b"),
        array_distinct(col("toks")).as("tb")))
      .withColumn("common", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard", round(col("common").cast("double")
        / (size(col("ta")) + size(col("tb")) - col("common")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  test("jaccardJoin ≡ naive all-pairs at several thresholds") {
    val (l, r) = corpora
    for (tau <- Seq(0.5, 0.8, 0.95)) {
      val fast = SetSimJoin.jaccardJoin(l, r, "doc_id", "toks", tau)
      val truth = naive(tau)
      assert(fast.unionAll(truth).distinct().count() === truth.count(),
        s"prefix-filtered result differs from naive at tau=$tau")
      assert(fast.count() === truth.count(),
        s"row-count mismatch vs naive at tau=$tau")
    }
  }

  test("prefixes are genuinely shorter than the token sets") {
    // the filter's whole point: at tau=0.95 a 20-token set carries a
    // 2-token prefix into the candidate join, not all 20
    val (l, _) = corpora
    val sz = l.select(size(array_distinct(col("toks"))).as("n"))
      .agg(avg(col("n"))).head.getDouble(0)
    val tau = 0.95
    val prefixAvg = sz - math.ceil(tau * sz) + 1
    assert(prefixAvg < sz / 2,
      s"prefix ($prefixAvg of $sz tokens) should be a small fraction")
  }

  test("empty token sets never match; tau bounds are enforced") {
    import spark.implicits._
    val l = Seq((1L, Seq.empty[String]), (2L, Seq("a", "b")))
      .toDF("doc_id", "toks")
    val r = Seq((10L, Seq.empty[String]), (20L, Seq("a", "b")))
      .toDF("doc_id", "toks")
    val out = SetSimJoin.jaccardJoin(l, r, "doc_id", "toks", 0.5).collect()
    assert(out.map(x => (x.getLong(0), x.getLong(1))).toSet
      === Set((2L, 20L)))
    intercept[IllegalArgumentException] {
      SetSimJoin.jaccardJoin(l, r, "doc_id", "toks", 0.0)
    }
  }

  test("duplicate tokens in the input collapse before similarity") {
    import spark.implicits._
    val l = Seq((1L, Seq("a", "a", "a", "b"))).toDF("doc_id", "toks")
    val r = Seq((2L, Seq("a", "b", "b"))).toDF("doc_id", "toks")
    val out = SetSimJoin.jaccardJoin(l, r, "doc_id", "toks", 0.9).collect()
    assert(out.length === 1 && out(0).getDouble(2) === 1.0)
  }

  test("pairStats matches a hand-computed basket corpus") {
    import spark.implicits._
    // 4 baskets; {a,b} co-occur in 2, {a,c} in 1 (below minCo)
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"), // dup item collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "d")).toDF("b", "i")
    val out = Association.pairStats(rows, "b", "i", minCo = 2L)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[String]("item_a") === "a"
      && r.getAs[String]("item_b") === "b")
    assert(r.getAs[Long]("n_co") === 2L)
    assert(r.getAs[Double]("support") === 0.5) // 2 of 4 baskets
    assert(r.getAs[Double]("confidence_ab") === round6(2.0 / 3)) // f(a)=3
    assert(r.getAs[Double]("lift") === round6(4.0 * 2 / (3 * 2)))
  }

  test("pairStats drops oversized baskets whole (skew guard)") {
    import spark.implicits._
    val big = (1 to 50).map(i => (9L, s"x$i"))
    val rows = (Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")) ++ big)
      .toDF("b", "i")
    val out = Association.pairStats(rows, "b", "i", minCo = 2L,
      maxBasketSize = 10).collect()
    // the 50-item basket contributes no pairs AND no frequency mass:
    // support denominator is 2 baskets, not 3
    assert(out.length === 1 && out(0).getAs[Double]("support") === 1.0)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
