package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{MvRegistry, MvRewrite}

class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def scanPaths(df: DataFrame): Set[String] =
    MvRegistry.scanRoots(df.queryExecution.optimizedPlan)

  private def withMv(test: (String, String, DataFrame) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString
    val basePath = s"$dir/base"
    val sumPath = s"$dir/sum"
    (1 to 100).map(i =>
        (if (i % 3 == 0) "a" else "b", i.toLong % 7, i.toDouble))
      .toDF("g", "u", "v")
      .write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)
    MvRegistry.clear()
    MvRegistry.buildSummary(base, sumPath, Seq("g", "u"), Seq("v"))
    try test(basePath, sumPath, base)
    finally MvRegistry.clear()
  }

  test("rewrites coarser rollups onto the summary, values intact") {
    withMv { (basePath, sumPath, base) =>
      val q = base.groupBy($"g").agg(
        round(sum($"v"), 4).as("sv"), count($"v").as("cv"),
        count(lit(1)).as("cr"), min($"v").as("mn"), max($"v").as("mx"))
        .orderBy($"g")
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(sumPath)),
        s"expected summary scan, got $paths")
      assert(!paths.exists(_.contains(basePath)))
      // values identical to the un-rewritten plan
      MvRegistry.clear()
      val direct = base.groupBy($"g").agg(
        round(sum($"v"), 4).as("sv"), count($"v").as("cv"),
        count(lit(1)).as("cr"), min($"v").as("mn"), max($"v").as("mx"))
        .orderBy($"g")
      assert(q.collect().toSeq === direct.collect().toSeq)
    }
  }

  test("stays away from shapes outside the contract") {
    withMv { (basePath, sumPath, base) =>
      // distinct aggregate: not decomposable
      assert(!scanPaths(base.groupBy($"g")
        .agg(countDistinct($"v"))).exists(_.contains(sumPath)))
      // avg: not registered as a partial pair in v1
      assert(!scanPaths(base.groupBy($"g").agg(avg($"v")))
        .exists(_.contains(sumPath)))
      // filter on a GROUP column subsumes: whole summary groups are
      // kept or dropped, so the rewrite fires and stays exact
      val filtered = base.filter($"u" > 2).groupBy($"g")
        .agg(sum($"v").as("sv")).orderBy($"g")
      assert(scanPaths(filtered).exists(_.contains(sumPath)))
      MvRegistry.clear()
      val directF = base.filter($"u" > 2).groupBy($"g")
        .agg(sum($"v").as("sv")).orderBy($"g")
      assert(filtered.collect().toSeq === directF.collect().toSeq)
      MvRegistry.buildSummary(base, sumPath, Seq("g", "u"), Seq("v"))
      // filter on a MEASURE column selects individual base rows the
      // summary already merged — not subsumable, must not fire
      assert(!scanPaths(base.filter($"v" > 2).groupBy($"g")
        .agg(sum($"v"))).exists(_.contains(sumPath)))
      // grouping by a non-view column
      assert(!scanPaths(base.groupBy($"v").agg(count(lit(1))))
        .exists(_.contains(sumPath)))
      // arithmetic AROUND the aggregate call stays inside the
      // contract and must still rewrite
      assert(scanPaths(base.groupBy($"g")
        .agg((sum($"v") * 2 + count(lit(1))).as("x")))
        .exists(_.contains(sumPath)))
      // unregistered base
      val other = (1 to 10).map(i => ("x", i.toLong, 1.0))
        .toDF("g", "u", "v")
      assert(!scanPaths(other.groupBy($"g").agg(sum($"v")))
        .exists(_.contains(sumPath)))
    }
  }

  test("same-granularity and single-column groupings both rewrite") {
    withMv { (_, sumPath, base) =>
      val fine = base.groupBy($"g", $"u").agg(sum($"v").as("sv"))
      assert(scanPaths(fine).exists(_.contains(sumPath)))
      val byU = base.groupBy($"u").agg(count(lit(1)).as("n"))
      assert(scanPaths(byU).exists(_.contains(sumPath)))
      // spot-check one value: count(*) via __cnt_star re-aggregation
      val n = byU.filter($"u" === 0).head.getAs[Long]("n")
      assert(n === 14L) // multiples of 7 in 1..100
    }
  }
}
