package graft

import org.apache.spark.sql.functions._

import graft.sinks.ZOrder

/** Z-order clustering: row preservation plus the property that
  * actually matters — multi-dimensional file-level min/max bounding
  * boxes tighten enough that a 2-D predicate box overlaps few files,
  * while a linear single-key layout leaves every file overlapping. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")

  /** How many files' (partkey × suppkey) bounding boxes intersect the
    * predicate box partkey∈[40,60] × suppkey∈[3,4]? */
  private def filesHit(path: String): (Long, Long) = {
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
    val hit = stats.filter($"phi" >= 40 && $"plo" <= 60 &&
      $"shi" >= 3 && $"slo" <= 4)
    (hit.count(), stats.count())
  }

  test("z-order write preserves rows exactly") {
    val out = java.nio.file.Files.createTempDirectory("graft_z1").toString
    val n = ZOrder.write(li, out, Seq("l_partkey", "l_suppkey"),
      numFiles = 16)
    assert(n === li.count())
    val back = spark.read.parquet(out)
    assert(back.count() === n)
    assert(back.select(sum($"l_quantity")).head().getDouble(0) ===
      li.select(sum($"l_quantity")).head().getDouble(0))
  }

  test("2-D box predicate prunes most z-ordered files, few linear ones") {
    val zdir = java.nio.file.Files.createTempDirectory("graft_z2").toString
    ZOrder.write(li, zdir, Seq("l_partkey", "l_suppkey"), numFiles = 16)
    val ldir = java.nio.file.Files.createTempDirectory("graft_z3").toString
    li.repartitionByRange(16, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(ldir)

    val (zHit, zTotal) = filesHit(zdir)
    val (lHit, lTotal) = filesHit(ldir)
    assert(zTotal === 16 && lTotal === 16)
    // the linear layout scatters both dims across every file
    assert(lHit >= 14, s"linear layout unexpectedly clustered: $lHit")
    // the z-curve confines the box to a corner of the file set
    assert(zHit <= lHit / 2,
      s"z-order box hit $zHit of $zTotal files vs linear $lHit")
  }
}
