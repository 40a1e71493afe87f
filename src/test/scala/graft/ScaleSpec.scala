package graft

import org.apache.spark.sql.functions._
import graft.plans.Scale

/** Skew salting + bucketed co-located joins (100 TB layout knobs). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val salted = Scale.saltedSum(li, "l_returnflag", "l_quantity")
      .orderBy("l_returnflag").collect()
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getString(0) == p.getString(0))
      assert(math.abs(s.getDouble(1) - p.getDouble(1)) < 1e-6)
      assert(s.getLong(2) == p.getLong(2))
    }
    // phase-1 plan really fans the hot key out over salt buckets
    val phase1 = Scale.saltedSum(li, "l_returnflag", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(phase1.contains("__salt") || phase1.contains("hash"))
  }

  test("salted join equals plain join and spreads the hot key") {
    val fact = Tables.load(spark, sf0001, "events")
      .select($"user_id".as("c_custkey"), $"value")
    val dim = Tables.load(spark, sf0001, "customer")
      .select($"c_custkey", $"c_mktsegment")
    val salted = Scale.saltedJoin(fact, dim, "c_custkey", saltBuckets = 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .orderBy("c_mktsegment").collect()
    val plain = fact.join(dim, Seq("c_custkey"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .orderBy("c_mktsegment").collect()
    assert(salted.length === plain.length && salted.nonEmpty)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(a.getLong(1) === b.getLong(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-6)
    }
    // the hottest key really lands in multiple salt buckets
    val hot = fact.groupBy($"c_custkey").count()
      .orderBy($"count".desc, $"c_custkey").limit(1)
      .collect().head.getLong(0)
    val buckets = fact.filter($"c_custkey" === hot)
      .withColumn("__salt",
        pmod(hash(fact.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(buckets > 1, s"hot key $hot stayed in $buckets bucket(s)")
  }

  test("bucketed join has no Exchange on either side") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val o = Tables.load(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_totalprice")
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
    Scale.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(li, "b_lineitem", "o_orderkey", 8)
    // disable broadcast so the planner must consider the shuffle it
    // would otherwise need — bucketing removes it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val n = joined.count()
      assert(n == Tables.load(spark, sf0001, "lineitem").count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("saltedJoin rejects outer join types that would duplicate dim rows") {
    val fact = Seq((1, "a")).toDF("k", "v")
    val dim = Seq((1, "x"), (2, "y")).toDF("k", "d")
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(fact, dim, "k", joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Scale.saltedJoin(fact, dim, "k", joinType = "right")
    }
    // fact-preserving types stay accepted
    assert(Scale.saltedJoin(fact, dim, "k", joinType = "left").count() == 1)
    assert(Scale.saltedJoin(fact, dim, "k", joinType = "left_semi").count() == 1)
  }

  test("groupedTopK equals the single-window grouped top-k") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.load(spark, sf0001, "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
    val single = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val want = orders.withColumn("rank", row_number().over(single))
      .filter($"rank" <= 5)
      .orderBy($"o_orderpriority", $"rank").collect()
    val got = Scale.groupedTopK(orders, Seq("o_orderpriority"),
        Seq($"o_totalprice".desc, $"o_orderkey".asc), k = 5, saltBuckets = 7)
      .orderBy($"o_orderpriority", $"rank").collect()
    assert(got.toSeq == want.toSeq)
    // phase-1 really fans out: the first exchange keys on (group, salt)
    val plan = Scale.groupedTopK(orders, Seq("o_orderpriority"),
      Seq($"o_totalprice".desc), k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("skewReport surfaces the hot keys with correct shares") {
    val ev = Tables.load(spark, sf0001, "events")
    val report = Scale.skewReport(ev, "user_id", topK = 5).collect()
    assert(report.length == 5)
    val manual = ev.groupBy($"user_id").count()
      .orderBy($"count".desc, $"user_id").limit(5).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(report.map(r => r.getLong(0) -> r.getLong(1)).toSeq ==
      manual.toSeq)
    val total = ev.count().toDouble
    report.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getLong(1) / total) < 1e-4)
    }
  }

  test("exactPercentilesBracket equals the window form (incl. NULL groups)") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val want = Scale.exactPercentiles(li, "l_returnflag",
      "l_extendedprice", ps).orderBy("l_returnflag").collect()
    val got = Scale.exactPercentilesBracket(li, "l_returnflag",
      "l_extendedprice", ps).orderBy("l_returnflag").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to ps.length).foreach { i =>
        assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-9,
          s"${a.getString(0)} q$i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }
    // an all-NULL group surfaces with NULL percentiles in both forms
    val withNulls = Seq(("g1", Some(1.0)), ("g1", Some(2.0)),
      ("gN", Option.empty[Double])).toDF("g", "x")
    val b = Scale.exactPercentilesBracket(withNulls, "g", "x",
      Seq("p50" -> 0.5)).orderBy("g").collect()
    assert(b.length == 2 && b(0).getDouble(1) == 1.5 && b(1).isNullAt(1))
  }

  test("exactGlobalQuantiles equals builtin percentile exactly") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val got = Scale.exactGlobalQuantiles(li, "l_extendedprice",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p99" -> 0.99)).collect().head
    val want = li.agg(
        percentile($"l_extendedprice", lit(0.25)),
        percentile($"l_extendedprice", lit(0.50)),
        percentile($"l_extendedprice", lit(0.99)))
      .collect().head
    Seq(0, 1, 2).foreach { i =>
      assert(math.abs(got.getDouble(i) - want.getDouble(i)) < 1e-9,
        s"quantile $i: ${got.getDouble(i)} vs ${want.getDouble(i)}")
    }
    // boundary quantiles hit min/max
    val edges = Scale.exactGlobalQuantiles(li, "l_extendedprice",
      Seq("p0" -> 0.0, "p100" -> 1.0)).collect().head
    val mm = li.agg(min($"l_extendedprice"), max($"l_extendedprice"))
      .collect().head
    assert(edges.getDouble(0) == mm.getDouble(0))
    assert(edges.getDouble(1) == mm.getDouble(1))
  }

  test("groupedPercentiles dispatches to both regimes with equal results") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val ps = Seq("p50" -> 0.5, "p95" -> 0.95)
    val want = Scale.exactPercentiles(li, "l_returnflag",
      "l_extendedprice", ps).orderBy("l_returnflag").collect()
    // thresholds forcing each branch: (a) bracket (few huge groups —
    // accept any avg size), (b) window (demand impossible avg size)
    val viaBracket = Scale.groupedPercentiles(li, "l_returnflag",
      "l_extendedprice", ps, bracketMaxGroups = 100,
      bracketMinAvgRows = 1L).orderBy("l_returnflag").collect()
    val viaWindow = Scale.groupedPercentiles(li, "l_returnflag",
      "l_extendedprice", ps, bracketMaxGroups = 100,
      bracketMinAvgRows = Long.MaxValue).orderBy("l_returnflag").collect()
    Seq(viaBracket, viaWindow).foreach { got =>
      assert(got.length == want.length)
      got.zip(want).foreach { case (a, b) =>
        assert(a.getString(0) == b.getString(0))
        (1 to ps.length).foreach { i =>
          assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-9)
        }
      }
    }
  }

  test("NULL group KEY is a real group in both percentile forms") {
    // groupBy keeps a NULL key as its own group; the restore/bounds
    // joins inside both forms must be null-safe or the NULL-keyed
    // group would come back NULL (window form) or crash (bracket form)
    val df = Seq((Some("g1"), Some(1.0)), (Some("g1"), Some(3.0)),
      (Option.empty[String], Some(10.0)), (None, Some(20.0)),
      (None, Some(30.0))).toDF("g", "x")
    val ps = Seq("p50" -> 0.5)
    val w = Scale.exactPercentiles(df, "g", "x", ps)
      .orderBy($"g".asc_nulls_first).collect()
    val b = Scale.exactPercentilesBracket(df, "g", "x", ps)
      .orderBy($"g".asc_nulls_first).collect()
    Seq(w, b).foreach { r =>
      assert(r.length == 2)
      assert(r(0).isNullAt(0) && r(0).getDouble(1) == 20.0)
      assert(r(1).getString(0) == "g1" && r(1).getDouble(1) == 2.0)
    }
  }

  test("exactPercentiles matches builtin percentile under NULLs") {
    val df = Seq[(String, Option[Double])](
      ("g1", Some(1.0)), ("g1", None), ("g1", Some(3.0)), ("g1", Some(2.0)),
      ("g2", None), ("g2", None), // all-NULL group must survive with NULLs
      ("g3", Some(5.0))
    ).toDF("g", "v")
    val got = Scale.exactPercentiles(df, "g", "v",
      Seq("p50" -> 0.5, "p90" -> 0.9)).orderBy("g").collect()
    val want = df.groupBy($"g").agg(
        percentile($"v", lit(0.5)).as("p50"),
        percentile($"v", lit(0.9)).as("p90"))
      .orderBy("g").collect()
    assert(got.length == want.length && got.length == 3)
    got.zip(want).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      Seq(1, 2).foreach { i =>
        assert(a.isNullAt(i) == b.isNullAt(i), s"null mismatch at ${a.getString(0)} col $i")
        if (!a.isNullAt(i))
          assert(math.abs(a.getDouble(i) - b.getDouble(i)) < 1e-9)
      }
    }
  }

  test("prefixSum equals the single-partition global window") {
    import org.apache.spark.sql.expressions.Window
    // 100 rows, deliberately more partitions than natural; includes
    // duplicate values (tie-broken by id) and a long-typed measure
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toDouble))
      .toDF("id", "v")
    val got = Scale.prefixSum(df, Seq($"v".desc, $"id"), "v",
        sumCol = "cs", numPartitions = 8)
      .orderBy($"v".desc, $"id")
      .select($"id", $"cs").collect()
    val want = df
      .withColumn("cs", sum($"v").over(
        Window.orderBy($"v".desc, $"id")))
      .orderBy($"v".desc, $"id")
      .select($"id", $"cs").collect()
    assert(got.map(_.getLong(0)).toSeq === want.map(_.getLong(0)).toSeq)
    got.zip(want).foreach { case (a, b) =>
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9) }
    // more partitions than rows: empty ranges must not shift offsets
    val tiny = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    val t = Scale.prefixSum(tiny, Seq($"id"), "v", numPartitions = 8)
      .orderBy($"id").select($"cum_sum").collect().map(_.getDouble(0))
    assert(t.toSeq === Seq(10.0, 30.0, 60.0))
    intercept[IllegalArgumentException] {
      Scale.prefixSum(tiny, Seq.empty, "v")
    }
  }

  test("rankedPrefixSum equals the global rank + running-sum windows") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "v")
    val w = Window.orderBy($"v".desc, $"id")
    val got = Scale.rankedPrefixSum(df, Seq($"v".desc, $"id"), "v",
        rankCol = "rk", sumCol = "cs", numPartitions = 8)
      .orderBy($"id").select($"rk", $"cs").collect()
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cs", sum($"v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy($"id").select($"rk", $"cs").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      want.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("globalNtile equals the single-partition ntile window") {
    import org.apache.spark.sql.expressions.Window
    // n % buckets != 0, duplicate values (tie-broken by id), and the
    // boundary regimes: n < buckets, n == buckets, n > buckets
    // 5000 rows exceeds the range sampler's per-partition reservoir, the
    // regime where two independent exchange evaluations pick DIFFERENT
    // boundaries — the persist-before-fan-out guard is what keeps the
    // offsets aggregate and the probe on one partitioning there
    for (n <- Seq(3, 5, 23, 100, 5000); b <- Seq(1, 5, 7)) {
      val df = (1 to n).map(i => (i.toLong, (i % 11).toLong))
        .toDF("id", "v")
      val got = Scale.globalNtile(df, Seq($"v".desc, $"id"), b,
          "bkt", numPartitions = 8)
        .orderBy($"id").select($"bkt").collect().map(_.getLong(0))
      val want = df
        .withColumn("bkt", ntile(b).over(
          Window.orderBy($"v".desc, $"id")).cast("long"))
        .orderBy($"id").select($"bkt").collect().map(_.getLong(0))
      assert(got.toSeq === want.toSeq, s"n=$n buckets=$b")
    }
    intercept[IllegalArgumentException] {
      Scale.globalNtile(Seq((1L, 1L)).toDF("id", "v"), Seq($"id"), 0, "b")
    }
  }

  test("weightedQuantiles: smallest value whose cumulative weight reaches q·tot") {
    import spark.implicits._
    // g: total weight 10 — wq25 needs cumw ≥ 2.5 (v=2, cumw 9),
    // wq50 needs ≥ 5 (still v=2), wq99 needs ≥ 9.9 (v=10)
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 8.0), ("g", 10.0, 1.0),
      ("h", 5.0, 1.0), ("h", null.asInstanceOf[Any], 9.0))
      .map { case (g, v, w) => (g, Option(v).map(_.asInstanceOf[Double]), w) }
      .toDF("g", "v", "w")
    val out = Scale.weightedQuantiles(df, "g", "v", "w",
        Seq("wq25" -> 0.25, "wq50" -> 0.5, "wq99" -> 0.99))
      .orderBy($"g").collect()
    assert(out(0).getString(0) == "g" && out(0).getDouble(1) == 2.0 &&
      out(0).getDouble(2) == 2.0 && out(0).getDouble(3) == 10.0)
    // h: null value row drops entirely; the single 5.0 answers all qs
    assert(out(1).getString(0) == "h" && out(1).getDouble(1) == 5.0 &&
      out(1).getDouble(3) == 5.0)
    intercept[IllegalArgumentException] {
      Scale.weightedQuantiles(df, "g", "v", "w", Seq.empty)
    }
  }
}
