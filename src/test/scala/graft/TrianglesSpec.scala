package graft

import org.apache.spark.sql.functions._
import graft.operators.Triangles
import graft.curation.Features
import graft.text.TextAnalysis

/** Triangle census, quantile binning, BPE pair counts — the round-4
  * analytics additions with known-answer fixtures. */
class TrianglesSpec extends SparkSpec {

  test("census counts a known graph exactly") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) plus a pendant 5 — plus a dup row
    // and a self-loop that must be cleaned
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (4, 5), (2, 1), (3, 3)).toDF("u", "v")
    val r = Triangles.census(edges, "u", "v").collect()(0)
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 7L)
    assert(r.getAs[Long]("n_triangles") === 4L)
    // wedges: degrees (3,3,3,4,1) → Σd(d−1)/2 = (6+6+6+12+0)/2 = 15
    assert(r.getAs[Double]("clustering") === 0.8) // 3·4/15
  }

  test("degree-ordered census ≡ naive id-ordered count on real data") {
    val items = Tables.load(spark, sf001, "lineitem")
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      .distinct()
    val edges = items.as("a")
      .join(items.as("c"), col("a.b") === col("c.b")
        && col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("u"), col("c.i").as("v"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    val census = Triangles.census(edges, "u", "v").collect()(0)
    // naive id-ordered: canonical u<v edges, apex = smallest id
    val naive = edges.select(col("u"), col("v")).as("e1")
      .join(edges.select(col("u"), col("v").as("w")).as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.w"))
      .join(edges.select(col("u").as("v"), col("v").as("w")).as("e3"),
        Seq("v", "w"), "left_semi")
      .count()
    assert(census.getAs[Long]("n_triangles") === naive)
  }

  test("quantileBins yields near-equal bins and respects nulls") {
    import spark.implicits._
    val df = ((1 to 100).map(i => Some(i.toDouble)) :+ None)
      .toDF("value")
    val binned = Features.quantileBins(df, "value", nBins = 4)
    val counts = binned.filter(col("value").isNotNull)
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .orderBy(col("bin")).collect()
    assert(counts.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    // 100 values over 4 equal-frequency bins: 25-ish each (boundary
    // interpolation puts the cut between ranks, so exactly 25 here)
    assert(counts.map(_.getLong(1)).forall(n => n >= 24 && n <= 26))
    assert(binned.filter(col("value").isNull && col("bin").isNotNull)
      .count() === 0L)
    intercept[IllegalArgumentException] {
      Features.quantileBins(df, "value", nBins = 1)
    }
  }

  test("bpePairCounts weights pairs by word frequency") {
    import spark.implicits._
    // "ab ab abc x": words ab(f=2), abc(f=1); x dropped (len<2)
    // pairs: "a b" ← 2+1, "b c" ← 1
    val df = Seq("ab ab abc x", "").toDF("text")
    val out = TextAnalysis.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a b" -> 3L, "b c" -> 1L))
  }
}
